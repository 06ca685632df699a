from . import m31, qm31  # noqa: F401

P = m31.P
