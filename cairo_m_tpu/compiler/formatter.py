"""Cairo-M source formatter.

Role of `crates/compiler/formatter` (Wadler-style printer with comment
preservation, SURVEY.md §2.3), built token-first: formatting re-emits the
comment-carrying token stream with canonical spacing/indentation, so
comments survive by construction and idempotence is structural
(format(format(x)) == format(x), tested in tests/test_formatter.py).

Canon: 4-space indent; one space around binary operators, after commas and
around `->`; no space inside parens/brackets or before `;`/`,`; `{` on the
same line; at most one consecutive blank line; line comments keep their
attachment (same line -> two spaces before `//`).
"""

from __future__ import annotations

from .lexer import LexError, tokenize

INDENT = "    "

# operators glued to the previous token (no space before)
_NO_SPACE_BEFORE = {",", ";", ")", "]", ".", ":"}
_NO_SPACE_AFTER = {"(", "[", ".", "!"}
_UNARY_CTX = {"op", None}  # a '-'/'!'/'&' after these token kinds is unary


def format_source(src: str) -> str:
    toks = [t for t in tokenize(src, keep_comments=True) if t.kind != "eof"]
    out_lines: list[str] = []
    cur: list[str] = []
    depth = 0
    prev = None  # previous non-comment token on this line
    prev_line = 0

    def flush():
        nonlocal cur, prev
        line = "".join(cur).rstrip()
        out_lines.append(line)
        cur = []
        prev = None

    def start_line():
        if not cur:
            cur.append(INDENT * depth)

    def blank_gap(tok):
        """Preserve at most one blank line from the original."""
        if prev_line and tok.line > prev_line + 1 and out_lines and out_lines[-1] != "":
            out_lines.append("")

    i = 0
    while i < len(toks):
        t = toks[i]
        if t.kind == "comment":
            if cur and prev is not None and t.line == prev_line:
                cur.append("  " + t.text)
                flush()
            else:
                if cur:
                    flush()
                blank_gap(t)
                for k, cl in enumerate(t.text.splitlines()):
                    out_lines.append(
                        INDENT * depth + (cl.strip() if k else cl.rstrip())
                    )
            prev_line = t.line + t.text.count("\n")
            i += 1
            continue

        if t.text == "}":
            if cur:
                flush()
            depth = max(0, depth - 1)
            blank_gap(t)
            start_line()
            cur.append("}")
            # `} else`, `};`, `},` continue the line
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            if nxt is not None and (
                nxt.text in (";", ",") or nxt.text == "else"
            ):
                prev = t
                prev_line = t.line
                i += 1
                continue
            flush()
            prev_line = t.line
            i += 1
            continue

        if not cur:
            blank_gap(t)
        start_line()
        cur.append(_sep(prev, t) + t.text)
        prev = t
        prev_line = t.line

        if t.text == "{":
            depth += 1
            # attached trailing comment stays on this line
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            if not (
                nxt is not None
                and nxt.kind == "comment"
                and nxt.line == t.line
            ):
                flush()
        elif t.text == ";":
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            if not (
                nxt is not None
                and nxt.kind == "comment"
                and nxt.line == t.line
            ):
                flush()
        i += 1

    if cur:
        flush()
    while out_lines and out_lines[-1] == "":
        out_lines.pop()
    return "\n".join(out_lines) + "\n"


def _sep(prev, t) -> str:
    """Separator between the previous emitted token and t."""
    if prev is None:
        return ""
    a, b = prev.text, t.text
    if b in _NO_SPACE_BEFORE:
        return ""
    if a in _NO_SPACE_AFTER:
        return ""
    if b in ("(", "["):
        # call/index glue: ident( fn( )( ][  — but keyword ( gets a space
        if prev.kind in ("ident", "u32lit", "int") or a in (")", "]"):
            return ""
        if prev.kind == "kw" and a in ("fn",):
            return ""
        return " " if a not in ("(", "[") else ""
    if a == ")" and b == "{":
        return " "
    if a in ("{",):
        return " " if b == "}" else ""
    if b == "}" :
        return " "
    # unary +/-/! after operator/keyword/open: glue
    if b in ("-", "!", "&", "*") and (
        prev.kind == "op" and a not in (")", "]")
    ):
        return "" if a in ("(", "[", ",") else " "
    if prev.kind == "op" and a in ("-", "!") :
        # after a unary operator, glue the operand
        return ""
    if a == "," or a == ";":
        return " "
    if a == ":" :
        return " "
    if prev.kind == "op" and a not in (")", "]"):
        return " "
    if t.kind == "op":
        return " "
    return " "


def check_idempotent(src: str) -> bool:
    once = format_source(src)
    return format_source(once) == once
