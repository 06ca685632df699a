"""Language-server protocol surface (cairo_m_tpu/lsp.py) driven in-process."""

from cairo_m_tpu.lsp import Server

URI = "file:///demo.cm"

GOOD = """
const LIMIT = 10;
struct Point { x: felt, y: u32 }
fn square(v: felt) -> felt { return v * v; }
fn main(n: felt) -> felt { return square(n) + LIMIT; }
"""

BAD = """
fn main() -> felt { return missing_var; }
fn other() -> u32 { return 1u32 + also_missing; }
"""


def _open(server, text):
    return server.handle(
        "textDocument/didOpen",
        {"textDocument": {"uri": URI, "text": text}},
    )


def test_initialize_capabilities():
    s = Server()
    caps = s.handle("initialize", {})["capabilities"]
    assert caps["hoverProvider"] and caps["documentFormattingProvider"]
    assert caps["textDocumentSync"] == 1


def test_diagnostics_on_open_and_change():
    s = Server()
    pub = _open(s, BAD)
    assert pub["uri"] == URI
    assert len(pub["diagnostics"]) == 2
    assert all(d["severity"] == 1 for d in pub["diagnostics"])
    assert pub["diagnostics"][0]["range"]["start"]["line"] == 1
    # fixing the file clears the diagnostics
    pub = s.handle(
        "textDocument/didChange",
        {
            "textDocument": {"uri": URI},
            "contentChanges": [{"text": GOOD}],
        },
    )
    assert pub["diagnostics"] == []


def test_hover_function_struct_const():
    s = Server()
    _open(s, GOOD)

    def hover_at(line, char):
        return s.handle(
            "textDocument/hover",
            {
                "textDocument": {"uri": URI},
                "position": {"line": line, "character": char},
            },
        )

    h = hover_at(4, 36)  # `square` in the call
    assert h and "fn square(v: felt) -> felt" in h["contents"]["value"]
    h = hover_at(2, 8)  # `Point`
    assert h and "struct Point" in h["contents"]["value"]
    h = hover_at(1, 7)  # `LIMIT`
    assert h and "const LIMIT = 10" in h["contents"]["value"]
    assert hover_at(0, 0) is None


def test_formatting_edit():
    s = Server()
    _open(s, "fn main( )->felt{return  1;}")
    edits = s.handle(
        "textDocument/formatting",
        {"textDocument": {"uri": URI}, "options": {}},
    )
    assert len(edits) == 1
    assert edits[0]["newText"] == "fn main() -> felt {\n    return 1;\n}\n"


def test_shutdown_flag():
    s = Server()
    s.handle("shutdown", {})
    assert s.shutdown_requested
