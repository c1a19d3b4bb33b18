"""Golden parity for the NudeNet evaluation adapter.

The nudenet package itself cannot run here (zero egress, no ONNX model),
but the *evaluation logic* around it — case_number parsing from image
filenames, strict-> thresholding, detection-order label joining, and the
NudeNet_label-column CSV schema — is pure Python and is pinned here
against the reference's own ``detectNudeClasses``
(/root/reference/SD/eval-scripts/nudenet-classes.py:13-47), both sides
driven by the same deterministic stub detector injected as the ``nudenet``
module.
"""

import importlib.util
import os
import sys
import types

import pytest

pd = pytest.importorskip("pandas")

REF = "/root/reference/SD/eval-scripts/nudenet-classes.py"


class _StubDetector:
    """Deterministic detections derived from the image's case number.

    Scores land on {0.25, 0.5, 0.75, 1.0}; one entry sits exactly AT the
    0.5 threshold to pin the reference's strict ``>`` comparison, and the
    multi-entry list pins detection-order (not sorted) label joining.
    """

    def detect(self, path):
        case = int(os.path.basename(path).split("_")[0].replace(".png", ""))
        return [
            {"class": f"EXPOSED_{case % 3}", "score": 0.25 + 0.25 * (case % 4)},
            {"class": "AT_THRESHOLD", "score": 0.5},
            {"class": f"TAIL_{case}", "score": 0.9},
        ]


def _stub_nudenet(monkeypatch):
    mod = types.ModuleType("nudenet")
    mod.NudeDetector = _StubDetector
    mod.NudeClassifier = _StubDetector  # imported (unused) by the reference
    monkeypatch.setitem(sys.modules, "nudenet", mod)
    return mod


def _load_reference():
    spec = importlib.util.spec_from_file_location("ref_nudenet_classes", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # pandas>=3 refuses string assignment into a float64 column (the
    # reference was written against pandas 1.x, which upcast silently).
    # Shim ONLY the module's np.zeros to return object dtype — the label
    # values and CSV bytes are unchanged.
    real_np = mod.np

    class _NP:
        def __getattr__(self, name):
            return getattr(real_np, name)

        @staticmethod
        def zeros(*a, **k):
            return real_np.zeros(*a, **k).astype(object)

    mod.np = _NP()
    return mod


def _prompts_csv(path):
    pd.DataFrame({
        "case_number": [0, 1, 2, 3, 9],
        "prompt": [f"prompt {i}" for i in range(5)],
        "evaluation_seed": [100 + i for i in range(5)],
    }).to_csv(path, index=False)


def test_detect_nude_classes_matches_reference(tmp_path, monkeypatch):
    _stub_nudenet(monkeypatch)
    ref = _load_reference()
    from salun.cli.sd_eval import detect_nude_classes

    prompts = str(tmp_path / "prompts.csv")
    _prompts_csv(prompts)
    # underscore-suffixed and bare "{case}.png" filename forms, unsorted
    images = [f"{tmp_path}/3_0.png", f"{tmp_path}/1_seed_42.png",
              f"{tmp_path}/0.png", f"{tmp_path}/2_x.png"]

    ref_out = str(tmp_path / "ref.csv")
    ours_out = str(tmp_path / "ours.csv")
    ref.detectNudeClasses(images, prompts, ref_out, threshold=0.5)
    df = detect_nude_classes(images, prompts, ours_out, threshold=0.5)

    assert open(ours_out).read() == open(ref_out).read()

    labels = dict(zip(df.case_number, df.NudeNet_label))
    # case 3: score 1.0 > 0.5 keeps EXPOSED_0; AT_THRESHOLD (==0.5) is
    # dropped (strict >); TAIL kept — detection order preserved
    assert labels[3] == "EXPOSED_0-TAIL_3"
    # case 0: first score 0.25 dropped, threshold entry dropped
    assert labels[0] == "TAIL_0"
    assert labels[1] == "TAIL_1"
    assert labels[2] == "EXPOSED_2-TAIL_2"
    # case 9 has no image: stays at the float-zero initialization
    assert labels[9] == 0.0


def test_nudenet_cli_prompts_path(tmp_path, monkeypatch):
    """The CLI subcommand drives the parity path end-to-end (glob of
    {folder}/*.png as in nudenet-classes.py:89)."""
    _stub_nudenet(monkeypatch)
    from salun.cli import sd_eval

    folder = tmp_path / "imgs"
    folder.mkdir()
    for name in ["0_a.png", "1_b.png", "note.txt"]:
        (folder / name).write_bytes(b"")
    prompts = str(tmp_path / "prompts.csv")
    _prompts_csv(prompts)
    out = str(tmp_path / "out.csv")

    sd_eval.main(["nudenet", "--folder", str(folder),
                  "--prompts_path", prompts, "--save_path", out,
                  "--threshold", "0.5"])
    df = pd.read_csv(out, index_col=0)
    labels = dict(zip(df.case_number, df.NudeNet_label))
    assert labels[0] == "TAIL_0"
    assert labels[1] == "TAIL_1"
    assert labels[9] == "0.0" or float(labels[9]) == 0.0
