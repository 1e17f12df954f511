"""The driver contract: entry() compiles and dryrun_multichip executes the
full training step over dp and dp x tp meshes on the 8-device CPU mesh."""
import importlib.util
import os

import pytest


def _load():
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_dryrun_multichip_8(devices, capsys):
    mod = _load()
    mod.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dp dryrun ok on 8 devices" in out
    assert "dp x tp full-train-step dryrun ok" in out
    assert "dryrun_multichip passed" in out


def test_dryrun_multichip_2(devices, capsys):
    mod = _load()
    mod.dryrun_multichip(2)
    out = capsys.readouterr().out
    assert "dp dryrun ok on 2 devices" in out
