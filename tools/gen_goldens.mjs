// Golden-output generator: executes the REFERENCE JavaScript (read-only at
// /root/reference) under node to freeze expected outputs for every mode and
// every pipeline stage.  The Python engine in this repo must byte-match these.
//
// Usage: node tools/gen_goldens.mjs
//
// Reads fixtures from tests/fixtures/*.txt, writes tests/goldens/<fixture>__<mode>.txt
// and per-pipeline stage goldens tests/goldens/<fixture>__chain_<chain>.txt.
import { readFileSync, writeFileSync, readdirSync } from "node:fs";
import { join, basename } from "node:path";
import vm from "node:vm";

const REF = "/root/reference";
const FIX = new URL("../tests/fixtures/", import.meta.url).pathname;
const OUT = new URL("../tests/goldens/", import.meta.url).pathname;

// Load reference scripts in gpt.html order (gpt.html:254-271), sharing one
// sandbox whose globalThis is the script root.
const sandbox = { console, Promise, setTimeout };
sandbox.globalThis = sandbox;
vm.createContext(sandbox);
const order = [
  "filterRegistry/filterRegistry.js",
  "TextTransformer/TextTransformer.js",
  "js/textUtilsStd.js",
  "js/textUtilsInit.js",
  "js/textUtilsMain.js",
  "js/stripBlankLines.js",
  "js/textUtilsConvertForDoc.js",
  "js/textUtilsConvertForCau.js",
  "js/paragraphExtraction.js",
  "js/makeHtml.js",
  "js/defaultTextFilters.js",
  "js/modeLists.js",
  "js/jaTypoChecker.js",
];
for (const f of order) {
  vm.runInContext(readFileSync(join(REF, f), "utf8"), sandbox, { filename: f });
}

// app.js toHalfWidth pre-step (app.js:73-103): NFKC
const toHalfWidth = (text) => (text ? text.normalize("NFKC") : "");

// Mode -> chain names (modeLists.js:81,134,177,220,263,303,345,379)
const MODES = {
  officeAction: ["init", "main", "stripBlankLines", "convertEnd"],
  finalOfficeAction: ["init", "main", "stripBlankLines", "finalAction"],
  amendmentRefused: ["init", "main", "stripBlankLines", "convertEnd"],
  preExaminationReport: ["init", "main", "stripBlankLines", "convertEnd"],
  pct: ["init", "main"],
  pct_eng: ["init", "main_PCTENG"],
  paragraph: ["parExtract"],
  html: ["tohtml"],
};

const fixtures = readdirSync(FIX).filter((f) => f.endsWith(".txt"));
for (const fx of fixtures) {
  const raw = readFileSync(join(FIX, fx), "utf8");
  const name = basename(fx, ".txt");
  const normalized = toHalfWidth(raw);

  // Per-mode goldens
  for (const [mode, chains] of Object.entries(MODES)) {
    const out = await sandbox.runTextChains(chains, normalized, undefined, {
      stopOnError: true,
    });
    writeFileSync(join(OUT, `${name}__${mode}.txt`), out, "utf8");
  }

  // Cumulative per-chain goldens for the officeAction path (debug aid)
  let cur = normalized;
  for (const chain of ["init", "main", "stripBlankLines", "convertEnd"]) {
    cur = await sandbox.runTextChains([chain], cur, undefined, {
      stopOnError: true,
    });
    writeFileSync(join(OUT, `${name}__chain_${chain}.txt`), cur, "utf8");
  }

  // finalAction variant from the stripBlankLines stage
  const afterStrip = readFileSync(join(OUT, `${name}__chain_stripBlankLines.txt`), "utf8");
  const fin = await sandbox.runTextChains(["finalAction"], afterStrip, undefined, { stopOnError: true });
  writeFileSync(join(OUT, `${name}__chain_finalAction.txt`), fin, "utf8");

  // Typo findings golden (jaTypoChecker.js:242-301) as JSON
  const typo = sandbox.JaTypoChecker.check(raw);
  writeFileSync(
    join(OUT, `${name}__typo.json`),
    JSON.stringify(typo, null, 1),
    "utf8"
  );
}
console.log("goldens written for", fixtures.length, "fixtures");
