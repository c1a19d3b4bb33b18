"""Golden parity for the membership-inference evaluators vs the
reference's OWN code.

The reference ships two MIA implementations:
- ``Classification/evaluation/MIA.py`` — per-class threshold attacks
  (black_box_benchmarks, Song & Mittal);
- ``Classification/evaluation/SVC_MIA.py`` — SVC(C=3, rbf) shadow attack
  over five per-sample features.

Both are pure functions of (softmax probs, labels) once the model forward
is factored out, so they run verbatim here (CPU torch + sklearn) against
this repo's ``salun.evalx`` on identical random inputs.

The one deliberate divergence: SVC_MIA.py's torch ``m_entropy``
(SVC_MIA.py:12-22) indexes columns with the whole label vector
(``p[:, labels]``), a broadcast quirk that at dataset scale degenerates to
``-(1-p)·log p`` for every element; ``salun.evalx`` implements the
per-sample Song-Mittal definition instead, which is what MIA.py's
``_m_entr_comp`` (MIA.py:67-79) also does — so our m_entropy is pinned
against THAT reference implementation.
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

CLS_REF = "/root/reference/Classification"


def _load_ref_module(name, path):
    if name in sys.modules:
        return sys.modules[name]
    if CLS_REF not in sys.path:
        sys.path.insert(0, CLS_REF)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_mia():
    return _load_ref_module("ref_eval_MIA", f"{CLS_REF}/evaluation/MIA.py")


@pytest.fixture(scope="module")
def ref_svc_mia():
    # SVC_MIA.py does `from imagenet import get_x_y_from_data_dict` at
    # module level; reference imagenet.py needs torchvision + hf datasets
    # which are absent — stub just that symbol.
    import types

    if "imagenet" not in sys.modules:
        stub = types.ModuleType("imagenet")
        stub.get_x_y_from_data_dict = lambda *a, **k: (None, None)
        sys.modules["imagenet"] = stub
    return _load_ref_module("ref_eval_SVC_MIA", f"{CLS_REF}/evaluation/SVC_MIA.py")


def _random_split(rng, n, C, temp=2.0):
    logits = rng.standard_normal((n, C)) * temp
    p = np.exp(logits - logits.max(1, keepdims=True))
    p = (p / p.sum(1, keepdims=True)).astype(np.float32)
    y = rng.integers(0, C, (n,)).astype(np.int64)
    return p, y


def test_blackbox_benchmarks_match_reference(rng, ref_mia):
    """black_box_benchmarks (MIA.py:6-154) vs evalx.mia.BlackBoxBenchmarks
    on identical random (probs, labels): all four attack accuracies equal.
    """
    from salun.evalx.mia import BlackBoxBenchmarks

    C = 5
    splits = [_random_split(rng, n, C) for n in (40, 36, 28, 32)]

    ref = ref_mia.black_box_benchmarks(
        *[(p, y) for p, y in splits], num_classes=C
    )
    want = ref._mem_inf_benchmarks()

    got = BlackBoxBenchmarks(*splits, num_classes=C).run()

    for name in ("correctness", "confidence", "entropy", "m_entropy"):
        t_tr, t_te = want[name]
        assert got[name] == pytest.approx(0.5 * (t_tr + t_te), abs=1e-12), name


def test_m_entropy_matches_reference_per_sample(rng, ref_mia):
    """evalx m_entropy == MIA.py:_m_entr_comp (the per-sample Song-Mittal
    definition — see module docstring for why not SVC_MIA.py's quirk)."""
    from salun.evalx.svc_mia import entropy, m_entropy

    p, y = _random_split(rng, 64, 7)
    bb = ref_mia.black_box_benchmarks.__new__(ref_mia.black_box_benchmarks)
    want_m = bb._m_entr_comp(p, y)
    want_e = bb._entr_comp(p)
    np.testing.assert_allclose(m_entropy(p, y), want_m, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(entropy(p), want_e, rtol=1e-6, atol=1e-9)


def test_svc_attack_accuracies_match_reference(rng, ref_svc_mia):
    """The SVC shadow attack per feature (SVC_MIA.py:53-141) vs
    evalx.svc_mia features+svc_fit_predict: correctness / confidence /
    entropy / prob accuracies are identical (same sklearn SVC on the same
    feature matrices)."""
    from salun.evalx.svc_mia import features, svc_fit_predict

    C = 6
    st_p, st_y = _random_split(rng, 48, C)
    se_p, se_y = _random_split(rng, 48, C)
    tt_p, tt_y = _random_split(rng, 30, C)
    te_p, te_y = _random_split(rng, 26, C)

    def t(x):
        return torch.tensor(x)

    # reference feature construction (SVC_MIA.py:92-114)
    ref_feats = {}
    for tag, (p, y) in (("st", (st_p, st_y)), ("se", (se_p, se_y)),
                        ("tt", (tt_p, tt_y)), ("te", (te_p, te_y))):
        prob, lab = t(p), t(y)
        ref_feats[tag] = {
            "correctness": (torch.argmax(prob, axis=1) == lab).int(),
            "confidence": torch.gather(prob, 1, lab[:, None]),
            "entropy": ref_svc_mia.entropy(prob),
            "prob": prob,
        }

    ours = {
        "st": features(st_p, st_y), "se": features(se_p, se_y),
        "tt": features(tt_p, tt_y), "te": features(te_p, te_y),
    }

    for name in ("correctness", "confidence", "entropy", "prob"):
        want = ref_svc_mia.SVC_fit_predict(
            ref_feats["st"][name], ref_feats["se"][name],
            ref_feats["tt"][name], ref_feats["te"][name])
        got = svc_fit_predict(ours["st"][name], ours["se"][name],
                              ours["tt"][name], ours["te"][name])
        assert got == pytest.approx(want, abs=1e-12), name
