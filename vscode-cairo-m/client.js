// Cairo-M LSP client: launches `python -m cairo_m_tpu.lsp` over stdio.
const { workspace } = require("vscode");
const { LanguageClient } = require("vscode-languageclient/node");

let client;

function activate() {
  const cmd = workspace
    .getConfiguration("cairoM")
    .get("languageServerCommand");
  client = new LanguageClient(
    "cairoM",
    "Cairo-M Language Server",
    { command: cmd[0], args: cmd.slice(1) },
    { documentSelector: [{ scheme: "file", language: "cairo-m" }] }
  );
  client.start();
}

function deactivate() {
  return client ? client.stop() : undefined;
}

module.exports = { activate, deactivate };
