"""ML7 LSTM tail — gradient correctness, determinism, fold harness."""

import datetime as dt

import numpy as np

from practicum2_nof1_adhd_bd_spark.operators import deep


def test_lstm_bptt_matches_finite_differences():
    """The analytic full-BPTT gradients agree with central finite
    differences on every parameter tensor — the correctness proof a
    framework fit never gives you."""
    rng = np.random.default_rng(7)
    B, T, D, H = 3, 4, 2, 3
    X = rng.normal(size=(B, T, D))
    y = np.array([1.0, 0.0, 1.0])
    w = np.ones(B)
    params = deep._init_params(rng, D, H)
    _, grads = deep._loss_and_grads(params, X, y, w)
    eps = 1e-6
    for k in params:
        flat = params[k].ravel()
        gflat = np.asarray(grads[k]).reshape(params[k].shape).ravel()
        idxs = rng.choice(len(flat), size=min(8, len(flat)), replace=False)
        for i in idxs:
            orig = flat[i]
            flat[i] = orig + eps
            lp, _ = deep._loss_and_grads(params, X, y, w)
            flat[i] = orig - eps
            lm, _ = deep._loss_and_grads(params, X, y, w)
            flat[i] = orig
            num = (lp - lm) / (2 * eps)
            assert abs(num - gflat[i]) < 1e-5 * max(1.0, abs(num)), (
                k, i, num, gflat[i],
            )


def test_lstm_learns_separable_sequences():
    """A trivially separable task (positive sequences have a higher mean)
    must train to high accuracy — the fit actually optimizes."""
    rng = np.random.default_rng(0)
    B, T, D = 40, 6, 2
    y = np.array([1.0] * 20 + [0.0] * 20)
    X = rng.normal(size=(B, T, D)) + y[:, None, None] * 2.0
    params = deep._train_lstm(X, y, hidden=6, epochs=80, lr=0.05, seed=1)
    probs, _ = deep._forward(params, X)
    acc = ((probs >= 0.5).astype(float) == y).mean()
    assert acc >= 0.95


def test_lstm_fold_cv_shape_and_determinism(spark):
    """One row per fold with the metric columns; repeated runs are
    identical (seeded init, fixed epochs, no RNG anywhere else)."""
    rows = []
    d0 = dt.date(2024, 1, 1)
    for i in range(60):
        # regime flips every 10 days; features track the regime
        lab = 1 if (i // 10) % 2 else 0
        rows.append(
            (d0 + dt.timedelta(days=i), 10.0 + 5 * lab + (i % 3) * 0.1,
             1.0 * (i % 5), lab)
        )
    df = spark.createDataFrame(rows, "date date, f1 double, f2 double, label int")
    out = deep.lstm_fold_cv(
        df, ["f1", "f2"], "label", seq_len=5, hidden=4, epochs=15,
        train_days=20, val_days=10,
    )
    a = out.collect()
    assert len(a) >= 1
    assert set(out.columns) == {
        "fold_id", "n_train", "n_val", "accuracy", "macro_f1", "auroc"
    }
    for r in a:
        if r["n_train"] >= 4 and r["n_val"] > 0:
            assert r["accuracy"] is not None
    b = deep.lstm_fold_cv(
        df, ["f1", "f2"], "label", seq_len=5, hidden=4, epochs=15,
        train_days=20, val_days=10,
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_gru_bptt_matches_finite_differences():
    """GRU analytic full-BPTT gradients agree with central finite
    differences on every parameter tensor (same proof as the LSTM's)."""
    rng = np.random.default_rng(11)
    B, T, D, H = 3, 4, 2, 3
    X = rng.normal(size=(B, T, D))
    y = np.array([1.0, 0.0, 1.0])
    w = np.ones(B)
    params = deep._init_gru_params(rng, D, H)
    _, grads = deep._gru_loss_and_grads(params, X, y, w)
    eps = 1e-6
    for k in params:
        flat = params[k].ravel()
        gflat = np.asarray(grads[k]).reshape(params[k].shape).ravel()
        idxs = rng.choice(len(flat), size=min(8, len(flat)), replace=False)
        for i in idxs:
            orig = flat[i]
            flat[i] = orig + eps
            lp, _ = deep._gru_loss_and_grads(params, X, y, w)
            flat[i] = orig - eps
            lm, _ = deep._gru_loss_and_grads(params, X, y, w)
            flat[i] = orig
            num = (lp - lm) / (2 * eps)
            assert abs(num - gflat[i]) < 1e-5 * max(1.0, abs(num)), (
                k, i, num, gflat[i],
            )


def test_gru_learns_separable_sequences():
    rng = np.random.default_rng(0)
    B, T, D = 40, 6, 2
    y = np.array([1.0] * 20 + [0.0] * 20)
    X = rng.normal(size=(B, T, D)) + y[:, None, None] * 2.0
    params = deep._train_seq(X, y, hidden=6, epochs=80, lr=0.05, seed=1,
                             cell="gru")
    probs, _ = deep._gru_forward(params, X)
    acc = ((probs >= 0.5).astype(float) == y).mean()
    assert acc >= 0.95


def test_gru_fold_cv_shape_and_determinism(spark):
    """GRU rides the same fold harness: one row per fold, deterministic
    across runs, and NOT weight-identical to the LSTM (different cell)."""
    rows = []
    d0 = dt.date(2024, 1, 1)
    for i in range(60):
        lab = 1 if (i // 10) % 2 else 0
        rows.append(
            (d0 + dt.timedelta(days=i), 10.0 + 5 * lab + (i % 3) * 0.1,
             1.0 * (i % 5), lab)
        )
    df = spark.createDataFrame(rows, "date date, f1 double, f2 double, label int")
    kw = dict(seq_len=5, hidden=4, epochs=15, train_days=20, val_days=10)
    a = deep.gru_fold_cv(df, ["f1", "f2"], "label", **kw).collect()
    assert len(a) >= 1
    assert {r["fold_id"] for r in a} == set(range(len(a)))
    b = deep.gru_fold_cv(df, ["f1", "f2"], "label", **kw).collect()
    assert a == b


def test_conv1d_grads_match_finite_differences():
    """Conv1D analytic gradients — through dense, argmax-routed global
    max pool, and both valid convolutions — agree with central finite
    differences on every parameter tensor."""
    rng = np.random.default_rng(21)
    B, T, D, H = 4, 7, 2, 3
    X = rng.normal(size=(B, T, D))
    y = np.array([1.0, 0.0, 1.0, 0.0])
    w = np.ones(B)
    params = deep._init_conv_params(rng, D, H)
    _, grads = deep._conv_loss_and_grads(params, X, y, w)
    eps = 1e-6
    for k in params:
        flat = params[k].ravel()
        gflat = np.asarray(grads[k]).reshape(params[k].shape).ravel()
        idxs = rng.choice(len(flat), size=min(8, len(flat)), replace=False)
        for i in idxs:
            orig = flat[i]
            flat[i] = orig + eps
            lp, _ = deep._conv_loss_and_grads(params, X, y, w)
            flat[i] = orig - eps
            lm, _ = deep._conv_loss_and_grads(params, X, y, w)
            flat[i] = orig
            num = (lp - lm) / (2 * eps)
            assert abs(num - gflat[i]) < 1e-5 * max(1.0, abs(num)), (
                k, i, num, gflat[i],
            )


def test_cnn_lstm_grads_match_finite_differences():
    """CNN-LSTM hybrid gradients — LSTM BPTT with the input-gradient tap
    feeding the conv front-end — agree with central finite differences."""
    rng = np.random.default_rng(23)
    B, T, D, H = 3, 6, 2, 3
    X = rng.normal(size=(B, T, D))
    y = np.array([1.0, 0.0, 1.0])
    w = np.ones(B)
    params = deep._init_cnn_lstm_params(rng, D, H)
    _, grads = deep._cnn_lstm_loss_and_grads(params, X, y, w)
    eps = 1e-6
    for k in params:
        flat = params[k].ravel()
        gflat = np.asarray(grads[k]).reshape(params[k].shape).ravel()
        idxs = rng.choice(len(flat), size=min(8, len(flat)), replace=False)
        for i in idxs:
            orig = flat[i]
            flat[i] = orig + eps
            lp, _ = deep._cnn_lstm_loss_and_grads(params, X, y, w)
            flat[i] = orig - eps
            lm, _ = deep._cnn_lstm_loss_and_grads(params, X, y, w)
            flat[i] = orig
            num = (lp - lm) / (2 * eps)
            assert abs(num - gflat[i]) < 1e-5 * max(1.0, abs(num)), (
                k, i, num, gflat[i],
            )


def test_conv_cells_learn_separable_sequences():
    rng = np.random.default_rng(0)
    B, T, D = 40, 7, 2
    y = np.array([1.0] * 20 + [0.0] * 20)
    X = rng.normal(size=(B, T, D)) + y[:, None, None] * 2.0
    for cell in ("conv1d", "cnn_lstm"):
        params = deep._train_seq(X, y, hidden=6, epochs=80, lr=0.05,
                                 seed=1, cell=cell)
        probs, _ = deep._CELLS[cell][2](params, X)
        acc = ((probs >= 0.5).astype(float) == y).mean()
        assert acc >= 0.95, cell


def test_conv_fold_cv_shape_and_determinism(spark):
    """Both conv cells ride the same fold harness: one row per fold,
    deterministic across runs. seq_len=7 leaves 3 steps after two valid
    kernel-3 convs (the conv1d minimum-length contract)."""
    rows = []
    d0 = dt.date(2024, 1, 1)
    for i in range(60):
        lab = 1 if (i // 10) % 2 else 0
        rows.append(
            (d0 + dt.timedelta(days=i), 10.0 + 5 * lab + (i % 3) * 0.1,
             1.0 * (i % 5), lab)
        )
    df = spark.createDataFrame(rows, "date date, f1 double, f2 double, label int")
    kw = dict(seq_len=7, hidden=4, epochs=15, train_days=20, val_days=10)
    for fn in (deep.conv1d_fold_cv, deep.cnn_lstm_fold_cv):
        a = fn(df, ["f1", "f2"], "label", **kw).collect()
        assert len(a) >= 1
        assert {r["fold_id"] for r in a} == set(range(len(a)))
        b = fn(df, ["f1", "f2"], "label", **kw).collect()
        assert a == b
