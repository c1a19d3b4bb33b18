"""SVM membership-inference attack (SVC_MIA).

Parity with Classification/evaluation/SVC_MIA.py:25-150: collect softmax
probabilities; per-sample features correctness / confidence / entropy /
modified-entropy / raw prob; train an SVC(C=3, rbf, gamma='auto') shadow
attack on (shadow_train=member, shadow_test=non-member); attack accuracy =
mean over target splits. SalUn's reported MIA metric is
``forget_efficacy["confidence"] × 100`` (Classification/README.md:37).

Feature extraction is jitted/batched on device; only the tiny feature
matrices hit sklearn on the host.

Note: modified entropy here is the per-sample Song-Mittal definition (as in
evaluation/MIA.py:68-80); SVC_MIA.py's torch version indexes columns with
the whole label vector (SVC_MIA.py:12-22), a broadcast quirk we do not
reproduce.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from salun.data.loader import to_float


def collect_prob(model, params, batch_stats, loader):
    """Softmax probs + labels over a loader (SVC_MIA.py:25-50).

    Returns ``(None, None)`` for an absent/empty loader — the caller picks
    the class count from a non-empty split (the old ``np.zeros((0, 10))``
    hardcode broke CIFAR-100/ImageNet MIA when a split was missing)."""
    if loader is None:
        return None, None

    # weights as jit args, not closures (HLO-literal embedding; tpu_bench)
    @jax.jit
    def _probs(p_, s_, batch):
        variables = {"params": p_}
        if s_:
            variables["batch_stats"] = s_
        out = model.apply(variables, to_float(batch["image"]), train=False)
        return jax.nn.softmax(out.astype(jnp.float32), axis=-1)

    ps, ys = [], []
    for batch in loader:
        batch = jax.tree.map(jnp.asarray, batch)
        p = np.asarray(_probs(params, batch_stats, batch))
        w = np.asarray(batch["weight"]) > 0
        ps.append(p[w])
        ys.append(np.asarray(batch["label"])[w])
    if not ps:
        return None, None
    return np.concatenate(ps), np.concatenate(ys).astype(np.int64)


def entropy(p: np.ndarray) -> np.ndarray:
    logp = np.where(p > 0, np.log(np.maximum(p, 1e-30)), 0.0)
    return -(p * logp).sum(-1)


def m_entropy(p: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Modified prediction entropy (Song & Mittal)."""
    eps = 1e-30
    log_p = np.log(np.maximum(p, eps))
    rev = 1.0 - p
    log_rev = np.log(np.maximum(rev, eps))
    mod_p = p.copy()
    mod_logp = log_rev.copy()
    r = np.arange(len(labels))
    mod_p[r, labels] = rev[r, labels]
    mod_logp[r, labels] = log_p[r, labels]
    return -(mod_p * mod_logp).sum(-1)


def features(prob: np.ndarray, labels: np.ndarray) -> dict:
    corr = (np.argmax(prob, axis=1) == labels).astype(np.float64)[:, None]
    conf = np.take_along_axis(prob, labels[:, None], axis=1)
    return {
        "correctness": corr,
        "confidence": conf,
        "entropy": entropy(prob)[:, None],
        "m_entropy": m_entropy(prob, labels)[:, None],
        "prob": prob,
    }


def svc_fit_predict(shadow_train, shadow_test, target_train, target_test):
    """SVC_MIA.py:53-82: fit member/non-member on shadows, score targets."""
    from sklearn.svm import SVC

    X = np.concatenate([shadow_train, shadow_test]).reshape(
        len(shadow_train) + len(shadow_test), -1
    )
    Y = np.concatenate([np.ones(len(shadow_train)), np.zeros(len(shadow_test))])
    clf = SVC(C=3, gamma="auto", kernel="rbf")
    clf.fit(X, Y)

    accs = []
    if target_train is not None and len(target_train) > 0:
        accs.append(clf.predict(target_train.reshape(len(target_train), -1)).mean())
    if target_test is not None and len(target_test) > 0:
        accs.append(1 - clf.predict(target_test.reshape(len(target_test), -1)).mean())
    return float(np.mean(accs))


def SVC_MIA(model, params, batch_stats, *, shadow_train, shadow_test,
            target_train, target_test) -> dict:
    """Five attack accuracies (SVC_MIA.py:85-150). Loader args may be None.

    Forget-efficacy usage (main_random.py:165-186): shadow_train =
    retain[:len(test)], shadow_test = test, target_test = forget.
    """
    st_p, st_y = collect_prob(model, params, batch_stats, shadow_train)
    se_p, se_y = collect_prob(model, params, batch_stats, shadow_test)
    tt_p, tt_y = collect_prob(model, params, batch_stats, target_train)
    te_p, te_y = collect_prob(model, params, batch_stats, target_test)

    # class count from any non-empty split (never hardcoded)
    widths = [p.shape[1] for p in (st_p, se_p, tt_p, te_p) if p is not None]
    if not widths:
        raise ValueError("SVC_MIA: every split is empty")
    n_classes = widths[0]

    def _or_empty(p, y):
        if p is None:
            return (np.zeros((0, n_classes), np.float32),
                    np.zeros((0,), np.int64))
        return p, y

    st_p, st_y = _or_empty(st_p, st_y)
    se_p, se_y = _or_empty(se_p, se_y)
    tt_p, tt_y = _or_empty(tt_p, tt_y)
    te_p, te_y = _or_empty(te_p, te_y)

    f_st = features(st_p, st_y)
    f_se = features(se_p, se_y)
    f_tt = features(tt_p, tt_y) if len(tt_p) else {k: None for k in f_st}
    f_te = features(te_p, te_y) if len(te_p) else {k: None for k in f_st}

    return {
        name: svc_fit_predict(f_st[name], f_se[name], f_tt[name], f_te[name])
        for name in ("correctness", "confidence", "entropy", "m_entropy", "prob")
    }
