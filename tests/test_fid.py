"""FID/IS/precision-recall machinery tests (extractor-agnostic)."""

import numpy as np
import pytest

from salun.evalx.fid import (
    FIDStatistics, ManifoldEstimator, evaluate_all, inception_score,
    precision_recall,
)


def test_fid_zero_for_identical(rng):
    acts = rng.standard_normal((500, 16)).astype(np.float64)
    s1 = FIDStatistics.from_activations(acts)
    s2 = FIDStatistics.from_activations(acts.copy())
    assert abs(s1.frechet_distance(s2)) < 1e-6


def test_fid_closed_form_gaussians(rng):
    # For N(0,I) vs N(m,I): FID = ‖m‖² (large-sample)
    n, d = 20000, 4
    a = rng.standard_normal((n, d))
    m = np.array([1.0, 0.0, 0.0, 0.0])
    b = rng.standard_normal((n, d)) + m
    fid = FIDStatistics.from_activations(a).frechet_distance(
        FIDStatistics.from_activations(b)
    )
    assert abs(fid - 1.0) < 0.1, fid


def test_inception_score_uniform_vs_peaked():
    n, c = 1000, 10
    uniform = np.full((n, c), 1.0 / c)
    assert abs(inception_score(uniform) - 1.0) < 1e-5
    # confident + diverse → IS ≈ c
    peaked = np.eye(c)[np.arange(n) % c] * 0.999 + 0.001 / c
    peaked /= peaked.sum(1, keepdims=True)
    assert inception_score(peaked) > 8.0


def test_precision_recall_identical(rng):
    feats = rng.standard_normal((300, 8)).astype(np.float32)
    p, r = precision_recall(feats, feats.copy())
    assert p == 1.0 and r == 1.0


def test_precision_recall_disjoint(rng):
    a = rng.standard_normal((200, 8)).astype(np.float32)
    b = rng.standard_normal((200, 8)).astype(np.float32) + 100.0
    p, r = precision_recall(a, b)
    assert p == 0.0 and r == 0.0


def test_evaluate_all_keys(rng):
    real = rng.standard_normal((256, 8))
    gen = rng.standard_normal((256, 8))
    sm = np.abs(rng.standard_normal((256, 10)))
    sm /= sm.sum(1, keepdims=True)
    out = evaluate_all(real, gen, real, gen, sm)
    assert set(out) == {"inception_score", "fid", "sfid", "precision", "recall"}


def test_inception_v3_shapes(key):
    import jax.numpy as jnp

    from salun.evalx.inception import InceptionV3

    model = InceptionV3()
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(key, x)
    pool, spatial, sm = model.apply(variables, x)
    assert pool.shape == (1, 2048)
    assert spatial.shape[0] == 1
    assert sm.shape == (1, 1008)
    np.testing.assert_allclose(np.asarray(sm).sum(), 1.0, rtol=1e-5)


def test_pool3_parity_vs_pytorch_fid_weights():
    """FID comparability gate (SURVEY 'hard parts'): flax InceptionV3 pool3
    activations must match the pytorch-fid network on the same image.

    Needs the pytorch-fid checkpoint (pt_inception-2015-12-05-*.pth);
    zero-egress containers skip. Point SALUN_INCEPTION_PT at the file."""
    import os

    import numpy as np
    import pytest

    path = os.environ.get("SALUN_INCEPTION_PT", "")
    if not path or not os.path.exists(path):
        pytest.skip("pytorch-fid inception weights not available")
    torch = pytest.importorskip("torch")

    from salun.evalx.inception import load_params, make_feature_fn

    params, batch_stats = load_params(path)
    fn = make_feature_fn(params, batch_stats, batch_size=2)
    rng = np.random.default_rng(0)
    imgs = rng.random((2, 299, 299, 3)).astype(np.float32)
    ours = fn(imgs)

    sd = torch.load(path, map_location="cpu", weights_only=False)
    # pytorch-fid's FIDInceptionA/... graph is needed for a full forward;
    # when the package is present, compare end-to-end.
    fid_mod = pytest.importorskip("pytorch_fid.inception")
    net = fid_mod.InceptionV3([3], resize_input=False,
                              normalize_input=False)
    net.eval()
    with torch.no_grad():
        x = torch.tensor(imgs.transpose(0, 3, 1, 2)) * 2 - 1
        ref = net(x)[0].squeeze(-1).squeeze(-1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.slow  # InceptionV3 random-init + two feature extractions
def test_ddpm_evaluator_cli_pipeline_check(tmp_path):
    """End-to-end evaluator driver without real weights (its documented
    random-init pipeline-check mode): two tiny image folders in, all five
    metrics out, appended to result.csv (evaluator.py:77-101)."""
    import csv

    import numpy as np
    from PIL import Image

    from salun.cli.ddpm_evaluator import main

    rng = np.random.RandomState(0)
    for name in ("ref", "gen"):
        d = tmp_path / name
        d.mkdir()
        for i in range(6):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)
                            ).save(d / f"{i}.png")

    out_csv = tmp_path / "result.csv"
    main([str(tmp_path / "ref"), str(tmp_path / "gen"),
          "--output_csv", str(out_csv), "--batch_size", "4"])
    rows = list(csv.reader(open(out_csv)))
    assert rows[0][:2] == ["ref", "sample"]
    assert "fid" in rows[0] and "inception_score" in rows[0]
    assert len(rows) == 2 and len(rows[1]) == len(rows[0])


def test_sfid_spatial_tap_is_mixed_6d_output(key):
    """Pin the sFID tap location: the spatial feature must be the first 7
    channels of the Mixed_6d OUTPUT (= Mixed_6e input) — the torch-side
    equivalent of TF tensor ``mixed_6/conv:0`` [..., :7]
    (DDPM/evaluator.py:36,659-666): the TF graph's mixed_6 is the third
    17x17 InceptionC block and its ``conv`` branch is first in the concat,
    so the first 7 channels of branch and block-join coincide."""
    import jax.numpy as jnp
    import numpy as np

    from salun.evalx.inception import InceptionV3

    model = InceptionV3()
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)),
                    jnp.float32)
    variables = model.init(key, x)
    (pool, spatial, sm), inter = model.apply(
        x=x, variables=variables, capture_intermediates=True,
        mutable=["intermediates"])
    mixed_6d = inter["intermediates"]["Mixed_6d"]["__call__"][0]
    assert mixed_6d.shape[1:] == (17, 17, 768)
    want = np.asarray(mixed_6d[..., :7]).reshape(1, -1)
    np.testing.assert_array_equal(np.asarray(spatial), want)
