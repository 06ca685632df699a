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
        self._index_cache: dict = {}  # uri -> (text, SemanticIndex)
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
            "textDocument/completion": self.completion,
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
                "completionProvider": {"triggerCharacters": ["."]},
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

    # -- navigation (semantic-index-backed: every identifier occurrence is
    # resolved to its binding through lexical scopes, so goto-def and
    # references are shadowing-correct — compiler/semindex.py, role of the
    # reference's SemanticIndex in crates/compiler/semantic) --

    def _index(self, uri: str):
        from .compiler.semindex import build_index

        text = self.docs.get(uri, "")
        cached = self._index_cache.get(uri)
        if cached is not None and cached[0] == text:
            return cached[1]
        idx = build_index(text)
        self._index_cache[uri] = (text, idx)
        return idx

    def definition(self, params):
        uri = params["textDocument"]["uri"]
        idx = self._index(uri)
        b = idx.binding_at(
            params["position"]["line"], params["position"]["character"]
        )
        if b is None:
            return None
        return {
            "uri": uri,
            "range": _rng(b.line0, b.col0, b.line0, b.col0 + len(b.name)),
        }

    def references(self, params):
        uri = params["textDocument"]["uri"]
        idx = self._index(uri)
        b = idx.binding_at(
            params["position"]["line"], params["position"]["character"]
        )
        if b is None:
            return []
        return [
            {"uri": uri, "range": _rng(l, c, l, c + len(b.name))}
            for l, c in idx.references_to(b.id)
        ]

    def document_symbol(self, params):
        KIND = {"fn": 12, "struct": 23, "const": 14, "field": 8}
        uri = params["textDocument"]["uri"]
        idx = self._index(uri)
        return [
            {
                "name": b.name,
                "kind": KIND[b.kind],
                "location": {
                    "uri": uri,
                    "range": _rng(
                        b.line0, b.col0, b.line0, b.col0 + len(b.name)
                    ),
                },
            }
            for b in idx.bindings
            if b.kind in ("fn", "struct", "const")
        ]

    # -- completion --

    def completion(self, params):
        from .compiler.semindex import KEYWORDS, let_type_from_literal

        uri = params["textDocument"]["uri"]
        text = self.docs.get(uri, "")
        line = params["position"]["line"]
        col = params["position"]["character"]
        idx = self._index(uri)
        lines = text.splitlines()
        cur = lines[line] if line < len(lines) else ""
        before = cur[:col]
        # member access: `<receiver>.` -> the receiver type's fields
        stripped = before.rstrip()
        word_prefix = ""
        dot = False
        if stripped.endswith("."):
            dot = True
            recv_end = len(stripped) - 1
        else:
            a = len(before)
            while a > 0 and (before[a - 1].isalnum() or before[a - 1] == "_"):
                a -= 1
            word_prefix = before[a:]
            if a > 0 and before[:a].rstrip().endswith("."):
                dot = True
                recv_end = len(before[:a].rstrip()) - 1
        if dot:
            b = len(cur[:recv_end])
            a = b
            while a > 0 and (cur[a - 1].isalnum() or cur[a - 1] == "_"):
                a -= 1
            recv = cur[a:b]
            rb = idx.binding_at(line, a)
            ty = ""
            if rb is not None:
                ty = (rb.type_text or "").strip()
                if not ty and rb.kind == "let":
                    ty = let_type_from_literal(text, rb)
            fields = idx.struct_fields.get(ty, [])
            return {
                "isIncomplete": False,
                "items": [
                    {
                        "label": f.name,
                        "kind": 5,  # Field
                        "detail": f.type_text,
                        "sortText": f"0_{f.name}",
                    }
                    for f in fields
                    if f.name.startswith(word_prefix)
                ],
            }
        KIND = {"fn": 3, "struct": 22, "const": 21, "param": 6, "let": 6}
        items = [
            {
                "label": b.name,
                "kind": KIND.get(b.kind, 6),
                "detail": (b.type_text or b.kind),
                "sortText": f"0_{b.name}",
            }
            for b in idx.visible_at(line, col)
            if b.kind != "field" and b.name.startswith(word_prefix)
        ]
        items += [
            {"label": k, "kind": 14, "sortText": f"1_{k}"}
            for k in KEYWORDS
            if k.startswith(word_prefix)
        ]
        return {"isIncomplete": False, "items": items}

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
