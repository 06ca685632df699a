"""The Cairo-M language compiler: parse -> semantic -> codegen -> Program.

Pipeline equivalent of `crates/compiler` (SURVEY.md §2.3).  The incremental
(salsa) machinery and LSP are host-tooling non-goals for proving parity;
`compile_cairo` is the `compile_cairo(source, name, options)` entrypoint.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .codegen import ModuleCompiler
from .lexer import LexError
from .parser import ParseError, parse
from .sem import SemanticError, analyze


@dataclass
class CompilerOptions:
    verbose: bool = False
    optimization_level: str = "standard"  # none | standard


@dataclass
class Diagnostic:
    severity: str
    message: str
    file_path: str = ""
    line: int = 0


@dataclass
class CompilerOutput:
    program: object  # isa.program.Program
    diagnostics: list = field(default_factory=list)


class CompilationError(Exception):
    def __init__(self, diagnostics):
        super().__init__("; ".join(d.message for d in diagnostics))
        self.diagnostics = diagnostics


def compile_cairo(source: str, name: str = "<input>", options: CompilerOptions = None) -> CompilerOutput:
    options = options or CompilerOptions()
    try:
        ast = parse(source)
        tm = analyze(ast)
        if options.optimization_level != "none":
            from .passes import optimize_module

            tm = optimize_module(tm)
        # MIR path (SSA construction + pass pipeline + MIR codegen) per
        # function; constructs outside the MIR subset (arrays, pointers,
        # heap) fall back to the direct AST code generator.
        mir_codes = {}
        if options.optimization_level != "none":
            from .mir import Unsupported, lower_function
            from .mir_codegen import MirFnCodegen
            from .mir_passes import run_pipeline

            mc_probe = ModuleCompiler(tm)
            for f in tm.module.functions:
                try:
                    mfn = run_pipeline(lower_function(tm, f))
                    mir_codes[f.name] = MirFnCodegen(
                        mc_probe, mfn, tm.functions[f.name]
                    ).compile()
                except Unsupported:
                    pass
        program = ModuleCompiler(tm, mir_codes).compile()
        return CompilerOutput(program, [])
    except (LexError, ParseError) as e:
        raise CompilationError([Diagnostic("error", str(e), name)]) from e
    except SemanticError as e:
        raise CompilationError(
            [Diagnostic("error", e.msg, name, e.line)]
        ) from e
