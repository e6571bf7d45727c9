"""Pipeline registry + mode chains.

Re-expression of FilterRegistry (/root/reference/filterRegistry/
filterRegistry.js:122-506), the 8 registered pipelines
(/root/reference/js/defaultTextFilters.js:257-319), runTextChains
(defaultTextFilters.js:351-394) and ModeFunctionLists
(/root/reference/js/modeLists.js:54-400).

Key Spark-first decision (SURVEY.md §4.2): Catalyst does NOT fuse chained
pandas UDFs — each would be its own ArrowEvalPython node with a JVM<->Python
round-trip — so the registry composes ALL steps of a mode into ONE Python
callable; the executor sees a single mapInPandas stage.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from ..functions import parex, spans, trie, widths
from ..operators import blocks, lawnum, mainstage, strip_blank

StrFilter = Callable[[str], str]


@dataclass
class Step:
    """One pipeline step — FilterStep {fn, name?, args?, enabled?}
    (filterRegistry.js:68-77).  ``args`` are the step's own extra
    parameters, passed after the current string and before any
    invoke-time args: ``fn(current, *args, *invoke_args)``
    (filterRegistry.js:426-445)."""

    fn: StrFilter
    name: str
    enabled: bool = True
    args: tuple = ()


@dataclass
class PipelineRegistry:
    """Named ordered pipelines of str->str steps (filterRegistry.js:122-506).

    ``apply`` folds ``current = fn(current)`` exactly like _runPipeline
    (filterRegistry.js:406-478); ``stop_on_error=False`` keeps the pre-error
    value and continues (filterRegistry.js:453-462).  ``insert``/
    ``remove_at`` mirror the positional pipeline editing
    (filterRegistry.js:222-260); before/after/error hooks mirror
    beforeApply/afterApply/onError (filterRegistry.js:300-330) and feed
    job metrics instead of a UI; ``use`` is the plugin hook
    (filterRegistry.js:484-506).
    """

    _pipelines: dict[str, list[Step]] = field(default_factory=dict)
    _before_hooks: list = field(default_factory=list)
    _after_hooks: list = field(default_factory=list)
    _error_hooks: list = field(default_factory=list)

    def register(self, name: str, steps: list) -> None:
        self._pipelines[name] = self._normalize_steps(steps)

    @staticmethod
    def _normalize_step(item, i: int = 0) -> Step:
        """callable | Step | {fn, name?, args?, enabled?} -> Step
        (filterRegistry.js:364-389 _normalizeToStep)."""
        if isinstance(item, Step):
            return item
        if callable(item):
            return Step(fn=item, name=getattr(item, "__name__", f"step{i}"))
        if isinstance(item, dict):
            fn = item.get("fn")
            if not callable(fn):
                raise TypeError("FilterStep dict requires a callable 'fn'")
            return Step(
                fn=fn,
                name=item.get("name") or getattr(fn, "__name__", f"step{i}"),
                enabled=item.get("enabled", True) is not False,
                args=tuple(item.get("args") or ()),
            )
        raise TypeError(f"step must be callable, Step, or dict; got {type(item)!r}")

    @classmethod
    def _normalize_steps(cls, steps) -> list[Step]:
        if steps is None:
            raise TypeError("no filter list given")
        if not isinstance(steps, (list, tuple)):
            steps = [steps]
        out = [cls._normalize_step(item, i) for i, item in enumerate(steps)]
        if not out:
            raise ValueError("filter list has no steps")
        return out

    def unregister(self, name: str) -> None:
        self._pipelines.pop(name, None)

    def get(self, name: str) -> list[Step]:
        return self._pipelines[name]

    def names(self) -> list[str]:
        return list(self._pipelines)

    def insert(self, name: str, index: int, fn, step_name: str | None = None) -> None:
        """Insert a step (callable / Step / dict) at a position
        (filterRegistry.js insert)."""
        st = self._normalize_step(fn)
        if step_name:
            st.name = step_name
        self._pipelines[name].insert(index, st)

    def remove_at(self, name: str, index: int) -> Step:
        """Remove and return the step at a position (filterRegistry.js removeAt)."""
        return self._pipelines[name].pop(index)

    def enable(self, name: str, step_name: str, enabled: bool = True) -> None:
        for st in self._pipelines[name]:
            if st.name == step_name:
                st.enabled = enabled

    def on_before_apply(self, hook) -> None:
        """hook(pipeline_name, text) before each pipeline run."""
        self._before_hooks.append(hook)

    def on_after_apply(self, hook) -> None:
        """hook(pipeline_name, result) after each pipeline run."""
        self._after_hooks.append(hook)

    def on_error(self, hook) -> None:
        """hook(pipeline_name, step_name, exception) on step failure."""
        self._error_hooks.append(hook)

    def use(self, plugin) -> None:
        """Plugin installer: called with the registry (filterRegistry.js use)."""
        plugin(self)

    def apply(self, name: str, text: str, *invoke_args, stop_on_error: bool = True) -> str:
        """Fold the named pipeline over ``text``.

        Each enabled step runs as ``fn(current, *step.args, *invoke_args)``
        — step-specific args first, invoke-time common args after, exactly
        the argument order of _runPipeline (filterRegistry.js:426-445).
        A step returning None folds to "" (String(result ?? "")).
        """
        return self._run_steps(name, self._pipelines[name], text, invoke_args, stop_on_error)

    def apply_list(self, steps, text: str, *invoke_args, stop_on_error: bool = True) -> str:
        """Run an AD-HOC step list without registering it
        (filterRegistry.js:304-314 applyList; hook name "<adhoc>")."""
        return self._run_steps(
            "<adhoc>", self._normalize_steps(steps), text, invoke_args, stop_on_error
        )

    def _run_steps(
        self, name: str, steps: list[Step], text: str, invoke_args: tuple, stop_on_error: bool
    ) -> str:
        current = "" if text is None else str(text)
        for h in self._before_hooks:
            h(name, current)
        for st in steps:
            if not st.enabled:
                continue
            try:
                res = st.fn(current, *st.args, *invoke_args)
                current = "" if res is None else str(res)
            except Exception as exc:
                for h in self._error_hooks:
                    h(name, st.name, exc)
                if stop_on_error:
                    raise
        for h in self._after_hooks:
            h(name, current)
        return current

    def apply_chains(self, names: list[str], text: str, stop_on_error: bool = True) -> str:
        """runTextChains (defaultTextFilters.js:351-394)."""
        current = "" if text is None else str(text)
        for nm in names:
            try:
                current = self.apply(nm, current, stop_on_error=True)
            except Exception:
                if stop_on_error:
                    raise
        return current

    def compose(self, chain_names: list[str]) -> StrFilter:
        """Fuse multiple pipelines into one callable (the one-UDF-per-mode
        fusion described in SURVEY.md §4.2)."""
        steps = [
            st
            for nm in chain_names
            for st in self._pipelines[nm]
            if st.enabled
        ]
        # bind step args once at compose time; the common no-args case
        # stays a bare function reference (no call overhead added)
        fns = [
            st.fn if not st.args else (lambda s, _f=st.fn, _a=st.args: _f(s, *_a))
            for st in steps
        ]

        def fused(text: str) -> str:
            current = "" if text is None else str(text)
            for fn in fns:
                current = str(fn(current))
            return current

        return fused


def build_default_registry() -> PipelineRegistry:
    """The 8 named pipelines, verbatim step order
    (defaultTextFilters.js:257-319)."""
    reg = PipelineRegistry()
    reg.register("init", [
        widths.nl, widths.hw, widths.clean, widths.rm_blank,
        widths.squeeze, widths.trim, widths.gap, widths.lead,
    ])
    reg.register("main", [
        trie.apply_flexible_map,
        mainstage.pad_head,
        mainstage.trim_head,
        mainstage.tight_below_bullet,
        mainstage.fw_head,
        lawnum.fw_num_law,
        lawnum.fw_ref_law,
        lawnum.alpha_case,
        strip_blank.tight_claims,
    ])
    reg.register("main_PCTENG", [
        trie.apply_flexible_map,
        mainstage.pad_head,
        mainstage.trim_head,
        mainstage.tight_below_bullet,
        mainstage.fw_head,
        lawnum.fw_num_law,
        lawnum.fw_ref_law,
        # alphaCase excluded (defaultTextFilters.js:288)
        strip_blank.tight_claims,
    ])
    reg.register("stripBlankLines", [
        strip_blank.strip_blank_lines_in_correction_note,
        strip_blank.strip_blank_lines_in_search_result,
        strip_blank.strip_blank_lines_in_citation,
        strip_blank.strip_blank_lines_in_appendix,
        strip_blank.strip_blank_lines_in_priority,
        strip_blank.strip_blank_lines_in_amendment_suggestion,
    ])
    reg.register("convertEnd", [
        blocks.convert_for_doc,
        blocks.convert_for_family,
        blocks.convert_for_cau,
        blocks.convert_for_other,
        trie.apply_flexible_map,
    ])
    reg.register("finalAction", [
        blocks.convert_for_other,
    ])
    reg.register("parExtract", [
        parex.extract_paragraph_and_figure_refs,
    ])
    reg.register("tohtml", [
        spans.to_html,
    ])
    return reg


REGISTRY = build_default_registry()

# ModeFunctionLists (modeLists.js:81,134,177,220,263,303,345,379)
MODES: dict[str, list[str]] = {
    "officeAction": ["init", "main", "stripBlankLines", "convertEnd"],
    "finalOfficeAction": ["init", "main", "stripBlankLines", "finalAction"],
    "amendmentRefused": ["init", "main", "stripBlankLines", "convertEnd"],
    "preExaminationReport": ["init", "main", "stripBlankLines", "convertEnd"],
    "pct": ["init", "main"],
    "pct_eng": ["init", "main_PCTENG"],
    "paragraph": ["parExtract"],
    "html": ["tohtml"],
}


def convert_text(text: str, mode: str = "officeAction") -> str:
    """Full single-document conversion: toHalfWidth pre-step (app.js:496)
    then the mode's chains. Fail-safe: on error return input text
    (modeLists.js:95-104)."""
    if mode not in MODES:
        raise KeyError(f"unknown mode {mode!r}; available: {sorted(MODES)}")
    normalized = widths.to_half_width("" if text is None else str(text))
    try:
        return REGISTRY.apply_chains(MODES[mode], normalized)
    except Exception:
        return "" if text is None else str(text)


def register_sql_udfs(spark, prefix: str = "convert_") -> list[str]:
    """Expose every mode to SQL users as Arrow-batched scalar UDFs:

        SELECT convert_officeAction(text) FROM documents

    Each UDF is the same fused pipeline as the job (pandas Series in/out,
    one Arrow hop per batch).  Returns the registered function names.
    Reference parity: the mode radio buttons of gpt.html:55-157 as a SQL
    surface."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    names = []
    for mode in MODES:
        fn = mode_fn(mode)

        def make(f):
            def _run(s):
                return s.map(lambda t: f("" if t is None else str(t)))

            # real annotation objects: `from __future__ import annotations`
            # would stringify inline hints, which pyspark can't resolve here
            _run.__annotations__ = {"s": pd.Series, "return": pd.Series}
            return pandas_udf(_run, "string")

        name = f"{prefix}{mode}"
        spark.udf.register(name, make(fn))
        names.append(name)
    return names


def register_sql_udtfs(spark, prefix: str = "extract_") -> list[str]:
    """Table-function SQL surface (Spark 3.5+ Python UDTF, Arrow-enabled):

        SELECT d.doc_id, r.ref_type, r.num
        FROM documents d, LATERAL extract_refs(d.text) r

    ``extract_refs`` explodes a document's paragraph/figure references
    (the aggregation state of SURVEY §2.9 extractParagraphAndFigureRefs)
    into typed rows — the relational form of the paragraph-mode output,
    for SQL users who want refs as a TABLE instead of the formatted
    string.  Returns the registered function names."""
    from pyspark.sql.functions import udtf

    from ..functions import parex

    @udtf(returnType="ref_type: string, num: int, pad_width: int")
    class ExtractRefs:
        def eval(self, text: str):  # noqa: D401
            paras, width, figs = parex.extract_refs("" if text is None else str(text))
            for n in paras:
                yield ("paragraph", n, width)
            for n in figs:
                yield ("figure", n, 0)

    name = f"{prefix}refs"
    spark.udtf.register(name, ExtractRefs)
    return [name]


def mode_fn(mode: str) -> StrFilter:
    """One fused callable for a mode (pre-step + all chains), suitable for
    wrapping in a single mapInPandas stage."""
    fused = REGISTRY.compose(MODES[mode])

    def run(text: str) -> str:
        normalized = widths.to_half_width("" if text is None else str(text))
        try:
            return fused(normalized)
        except Exception:
            return "" if text is None else str(text)

    run.__name__ = f"mode_{mode}"
    return run
