"""PipelineRegistry API surface tests (filterRegistry.js:122-506 parity:
positional editing, enable/disable, hooks, stop-on-error policy, plugins)."""

import pytest

from patent_decision_document_converter_spark.plans.registry import PipelineRegistry


def up(s: str) -> str:
    return s.upper()


def excl(s: str) -> str:
    return s + "!"


def boom(s: str) -> str:
    raise ValueError("step failed")


@pytest.fixture()
def reg():
    r = PipelineRegistry()
    r.register("p", [up, excl])
    return r


def test_apply_order_and_names(reg):
    assert reg.apply("p", "hi") == "HI!"
    assert [s.name for s in reg.get("p")] == ["up", "excl"]
    assert reg.names() == ["p"]


def test_insert_and_remove_at(reg):
    reg.insert("p", 1, lambda s: s + "-mid", step_name="mid")
    assert reg.apply("p", "x") == "X-mid!"
    removed = reg.remove_at("p", 1)
    assert removed.name == "mid"
    assert reg.apply("p", "x") == "X!"


def test_enable_disable(reg):
    reg.enable("p", "excl", False)
    assert reg.apply("p", "hi") == "HI"
    reg.enable("p", "excl", True)
    assert reg.apply("p", "hi") == "HI!"
    # compose honors enabled flags at composition time
    reg.enable("p", "up", False)
    assert reg.compose(["p"])("hi") == "hi!"


def test_stop_on_error_policies(reg):
    reg.insert("p", 1, boom)
    with pytest.raises(ValueError):
        reg.apply("p", "hi")
    # keep-value-and-continue (filterRegistry.js:453-462)
    assert reg.apply("p", "hi", stop_on_error=False) == "HI!"


def test_hooks_fire(reg):
    events = []
    reg.on_before_apply(lambda n, t: events.append(("before", n, t)))
    reg.on_after_apply(lambda n, t: events.append(("after", n, t)))
    reg.on_error(lambda n, s, e: events.append(("error", n, s)))
    reg.insert("p", 0, boom)
    reg.apply("p", "hi", stop_on_error=False)
    assert events == [("before", "p", "hi"), ("error", "p", "boom"), ("after", "p", "HI!")]


def test_use_plugin(reg):
    def plugin(registry):
        registry.register("plugged", [excl])

    reg.use(plugin)
    assert reg.apply("plugged", "a") == "a!"


def test_unregister(reg):
    reg.unregister("p")
    assert reg.names() == []
