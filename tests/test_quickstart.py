"""The examples/ user paths stay runnable end-to-end: quickstart.py
(synthetic data -> label cache -> train -> validate/pseudo-seg in parity and
int8 serving -> predict CAM grid -> export --check) and serve_artifact.py
(deserialize the exported artifact and serve CAMs from it, no model code),
at minimal sizes."""

import importlib.util
import os
import pathlib

import pytest

pytest.importorskip("jax")

_EXAMPLES = pathlib.Path(__file__).resolve().parents[1] / "examples"


def _load_example(name):
    spec = importlib.util.spec_from_file_location(
        name, _EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_quickstart_end_to_end(tmp_path):
    qs = _load_example("quickstart")
    rc = qs.main(["--workdir", str(tmp_path), "--epochs", "1",
                  "--n_train", "8", "--n_val", "2"])
    assert rc == 0
    assert os.listdir(tmp_path / "seg_parity")
    assert os.listdir(tmp_path / "seg_int8")
    assert os.listdir(tmp_path / "predict_cam")
    artifact = tmp_path / "tiny_demo_int8.jaxex"
    assert artifact.stat().st_size > 0

    # the deployment side: serve CAMs from the artifact alone
    serve = _load_example("serve_artifact")
    rc = serve.main(["--artifact", str(artifact),
                     "--images", str(tmp_path / "VOCdevkit/JPEGImages"),
                     "--out", str(tmp_path / "served")])
    assert rc == 0
    served = os.listdir(tmp_path / "served")
    assert len(served) == 10  # 8 train + 2 val JPEGs
    assert all(f.endswith("_cam.jpg") for f in served)
