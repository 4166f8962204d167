"""The examples/quickstart.py user path stays runnable end-to-end
(synthetic data -> label cache -> train -> validate/pseudo-seg in parity and
int8 serving -> predict CAM grid -> export --check), at minimal sizes."""

import importlib.util
import os
import pathlib

import pytest

pytest.importorskip("jax")

_QS = pathlib.Path(__file__).resolve().parents[1] / "examples/quickstart.py"


def _load_quickstart():
    spec = importlib.util.spec_from_file_location("quickstart", _QS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_quickstart_end_to_end(tmp_path):
    qs = _load_quickstart()
    rc = qs.main(["--workdir", str(tmp_path), "--epochs", "1",
                  "--n_train", "8", "--n_val", "2"])
    assert rc == 0
    assert os.listdir(tmp_path / "seg_parity")
    assert os.listdir(tmp_path / "seg_int8")
    assert os.listdir(tmp_path / "predict_cam")
    assert (tmp_path / "tiny_demo_int8.jaxex").stat().st_size > 0
