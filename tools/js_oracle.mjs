// Differential-test oracle: reads JSON {mode, texts:[...]} lines on stdin,
// runs the REFERENCE pipeline for each, writes JSON array of outputs.
// Used by tests/test_differential.py and tools/fuzz_diff.py.
import { readFileSync } from "node:fs";
import { join } from "node:path";
import vm from "node:vm";

const REF = "/root/reference";
const sandbox = { console, Promise, setTimeout };
sandbox.globalThis = sandbox;
vm.createContext(sandbox);
for (const f of [
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
]) {
  vm.runInContext(readFileSync(join(REF, f), "utf8"), sandbox, { filename: f });
}

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

const req = JSON.parse(readFileSync(0, "utf8"));
const out = [];
for (const item of req) {
  const { mode, text } = item;
  if (mode === "typo") {
    out.push(sandbox.JaTypoChecker.check(text));
    continue;
  }
  if (mode === "custom") {
    // ad-hoc parameterized pipeline via the reference's own FilterRegistry:
    // steps = [{fn: "<name>", args?: [...], enabled?: bool}], fn resolved
    // from the reference namespaces.
    const NS = [
      sandbox.textUtilsMain,
      sandbox.Std,
      sandbox.textUtilsInit,
      sandbox.stripBlankLines,
    ];
    const resolve = (name) => {
      for (const ns of NS) if (ns && typeof ns[name] === "function") return ns[name];
      throw new Error(`unknown reference fn ${name}`);
    };
    const reg = new sandbox.FilterRegistry();
    const steps = item.steps.map((st) => ({
      fn: resolve(st.fn),
      args: st.args || [],
      enabled: st.enabled !== false,
    }));
    out.push(await reg.applyList(steps, text, item.invokeArgs || []));
    continue;
  }
  const normalized = text ? text.normalize("NFKC") : "";
  const chains = MODES[mode] || [mode]; // allow raw chain names too
  out.push(
    await sandbox.runTextChains(chains, normalized, undefined, { stopOnError: true })
  );
}
process.stdout.write(JSON.stringify(out));
