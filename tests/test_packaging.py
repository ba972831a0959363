"""Packaging smoke (VERDICT r4 ask #6): pyproject.toml must pin the exact
versions this suite is green on (parity with the reference's pin
discipline, reference evaluate/commands/setup.sh:1), and the console entry
point must resolve and run. The actual `pip install -e .` paths (main env
and fresh venv) are documented in docs/install.md and were exercised
manually; here we keep the pins honest against the live environment so a
version drift fails the suite before it invalidates the pins.
"""
import importlib.metadata
import tomllib
from pathlib import Path

import pytest

PYPROJECT = Path(__file__).resolve().parent.parent / "pyproject.toml"


def _pins():
    with open(PYPROJECT, "rb") as f:
        meta = tomllib.load(f)
    deps = meta["project"]["dependencies"]
    deps += meta["project"]["optional-dependencies"]["test"]
    out = {}
    for d in deps:
        name, _, ver = d.partition("==")
        assert ver, f"unpinned dependency in pyproject.toml: {d}"
        out[name] = ver
    return meta, out


@pytest.mark.quick
def test_pins_match_live_environment():
    _, pins = _pins()
    for name, ver in pins.items():
        live = importlib.metadata.version(name)
        # torch's live version carries a +cpu local tag; the pin is the
        # public version
        assert live.split("+")[0] == ver, (
            f"pyproject pins {name}=={ver} but the environment has {live}; "
            "update the pin — the pins must be the versions the suite is "
            "green on"
        )


@pytest.mark.quick
def test_console_entry_point_resolves_and_runs(capsys):
    meta, _ = _pins()
    target = meta["project"]["scripts"]["cocodr-tpu"]
    mod_name, _, fn_name = target.partition(":")
    mod = __import__(mod_name, fromlist=[fn_name])
    main = getattr(mod, fn_name)
    main(["presets"])
    out = capsys.readouterr().out
    assert "coco-base" in out and "ance-base" in out


@pytest.mark.quick
def test_version_consistent():
    import cocodr_tpu

    meta, _ = _pins()
    assert meta["project"]["version"] == cocodr_tpu.__version__
