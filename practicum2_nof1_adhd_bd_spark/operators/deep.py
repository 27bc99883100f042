"""Sequence-model tail — the reference's ML7 LSTM stage re-expressed for
Spark (ref src/etl/ml7_analysis.py:238-320 builds 14-day LSTM windows and
trains a small Keras LSTM per temporal fold; :475-493 the window builder;
README.md:42 reports macro-F1 0.25 / AUROC 0.58 on the N-of-1 data).

No deep-learning library exists in this environment, so the model is a
from-scratch numpy LSTM (single layer + sigmoid head) with analytic
full-BPTT gradients and Adam — seeded and fully deterministic, which a
framework fit would not be. The gradients are verified against finite
differences in tests (tests/test_deep.py), which is a stronger
correctness statement than trusting a framework default.

Spark decomposition — what is distributed and what is not:

- WINDOW BUILDING is distributed: `windows.sliding_sequences` assembles
  the trailing 14-day feature sequences with a bounded window over the
  daily grain (the corpus-scale part when features come from billions of
  events).
- FOLD TRAINING is parallel ACROSS folds: one `applyInPandas` group per
  temporal fold trains and evaluates its own LSTM on an executor. Each
  group holds one fold's day-grain windows — bounded by the calendar, so
  executor memory is safe at any corpus size (the same argument as MICE /
  ADWIN, the other accepted grouped-map surfaces).
- The per-fold fit itself is sequential gradient descent — exactly the
  reference's situation (its Keras fit is single-node too); what Spark
  buys is every fold training concurrently and the feature pipeline
  feeding them at scale.

Rows-only attestation (no SQL oracle): an iteratively trained network is
not SQL-expressible; determinism is pinned by seed + fixed epoch count
and asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import folds as folds_mod
from .windows import sliding_sequences


def _init_params(rng: np.random.Generator, d_in: int, hidden: int) -> dict:
    """Glorot-ish seeded init; forget-gate bias starts at 1 (standard
    Jozefowicz et al. 2015 trick so early gradients flow)."""
    scale = 1.0 / np.sqrt(hidden + d_in)
    p = {
        "W": rng.uniform(-scale, scale, (4 * hidden, hidden + d_in)),
        "b": np.zeros(4 * hidden),
        "Wy": rng.uniform(-scale, scale, (hidden, 1)),
        "by": np.zeros(1),
    }
    p["b"][hidden : 2 * hidden] = 1.0  # forget gate
    return p


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -60, 60)))


def _forward(params: dict, X: np.ndarray) -> tuple[np.ndarray, dict]:
    """X: (B, T, D) -> probabilities (B,), caching per-step tensors for
    BPTT."""
    B, T, D = X.shape
    H = params["Wy"].shape[0]
    h = np.zeros((B, H))
    c = np.zeros((B, H))
    cache = {"z": [], "i": [], "f": [], "o": [], "g": [], "c": [], "h": [],
             "c_prev": [], "tanh_c": []}
    for t in range(T):
        z = np.concatenate([h, X[:, t, :]], axis=1)          # (B, H+D)
        a = z @ params["W"].T + params["b"]                   # (B, 4H)
        i = _sigmoid(a[:, :H])
        f = _sigmoid(a[:, H : 2 * H])
        o = _sigmoid(a[:, 2 * H : 3 * H])
        g = np.tanh(a[:, 3 * H :])
        c_prev = c
        c = f * c_prev + i * g
        tc = np.tanh(c)
        h = o * tc
        for k, v in (("z", z), ("i", i), ("f", f), ("o", o), ("g", g),
                     ("c", c), ("h", h), ("c_prev", c_prev), ("tanh_c", tc)):
            cache[k].append(v)
    logits = (h @ params["Wy"] + params["by"]).ravel()        # (B,)
    probs = _sigmoid(logits)
    cache["h_T"] = h
    return probs, cache


def _init_gru_params(rng: np.random.Generator, d_in: int, hidden: int) -> dict:
    """Seeded GRU init (ref ml7_extended.py:186-216 adds a GRU config to
    the CFG grid; same Glorot-ish scheme as the LSTM). ``Wzr`` stacks the
    update/reset gates over [h, x]; ``Wn`` maps [r*h, x] to the candidate
    (the original Cho et al. 2014 formulation — the reset gate multiplies
    the STATE before the matmul, which keeps the BPTT chain simple and is
    what the finite-difference test pins)."""
    scale = 1.0 / np.sqrt(hidden + d_in)
    return {
        "Wzr": rng.uniform(-scale, scale, (2 * hidden, hidden + d_in)),
        "bzr": np.zeros(2 * hidden),
        "Wn": rng.uniform(-scale, scale, (hidden, hidden + d_in)),
        "bn": np.zeros(hidden),
        "Wy": rng.uniform(-scale, scale, (hidden, 1)),
        "by": np.zeros(1),
    }


def _gru_forward(params: dict, X: np.ndarray) -> tuple[np.ndarray, dict]:
    """GRU: z=sigm, r=sigm over [h,x]; n=tanh over [r*h, x];
    h' = (1-z)*n + z*h. X: (B,T,D) -> probabilities (B,)."""
    B, T, D = X.shape
    H = params["Wy"].shape[0]
    h = np.zeros((B, H))
    cache = {"zi": [], "z": [], "r": [], "n": [], "nin": [], "h_prev": []}
    for t in range(T):
        h_prev = h
        zi = np.concatenate([h_prev, X[:, t, :]], axis=1)      # (B, H+D)
        a = zi @ params["Wzr"].T + params["bzr"]               # (B, 2H)
        z = _sigmoid(a[:, :H])
        r = _sigmoid(a[:, H:])
        nin = np.concatenate([r * h_prev, X[:, t, :]], axis=1)  # (B, H+D)
        n = np.tanh(nin @ params["Wn"].T + params["bn"])
        h = (1 - z) * n + z * h_prev
        for k, v in (("zi", zi), ("z", z), ("r", r), ("n", n),
                     ("nin", nin), ("h_prev", h_prev)):
            cache[k].append(v)
    logits = (h @ params["Wy"] + params["by"]).ravel()
    probs = _sigmoid(logits)
    cache["h_T"] = h
    return probs, cache


def _gru_loss_and_grads(
    params: dict, X: np.ndarray, y: np.ndarray, w: np.ndarray
) -> tuple[float, dict]:
    """Weighted BCE + analytic full-BPTT GRU gradients (finite-difference
    verified in tests/test_deep.py alongside the LSTM's)."""
    B, T, D = X.shape
    H = params["Wy"].shape[0]
    probs, cache = _gru_forward(params, X)
    eps = 1e-12
    loss = -np.mean(
        w * (y * np.log(probs + eps) + (1 - y) * np.log(1 - probs + eps))
    )
    dlogit = (w * (probs - y) / B)[:, None]
    grads = {
        "Wzr": np.zeros_like(params["Wzr"]),
        "bzr": np.zeros_like(params["bzr"]),
        "Wn": np.zeros_like(params["Wn"]),
        "bn": np.zeros_like(params["bn"]),
        "Wy": cache["h_T"].T @ dlogit,
        "by": dlogit.sum(axis=0),
    }
    dh = dlogit @ params["Wy"].T                                # (B, H)
    for t in range(T - 1, -1, -1):
        z, r, n = cache["z"][t], cache["r"][t], cache["n"][t]
        zi, nin, h_prev = cache["zi"][t], cache["nin"][t], cache["h_prev"][t]
        dz = dh * (h_prev - n)
        dn = dh * (1 - z)
        dh_prev = dh * z
        dan = dn * (1 - n * n)                                  # (B, H)
        grads["Wn"] += dan.T @ nin
        grads["bn"] += dan.sum(axis=0)
        dnin = dan @ params["Wn"]                               # (B, H+D)
        drh = dnin[:, :H]                                       # d(r*h_prev)
        dr = drh * h_prev
        dh_prev = dh_prev + drh * r
        daz = dz * z * (1 - z)
        dar = dr * r * (1 - r)
        da = np.concatenate([daz, dar], axis=1)                 # (B, 2H)
        grads["Wzr"] += da.T @ zi
        grads["bzr"] += da.sum(axis=0)
        dzi = da @ params["Wzr"]                                # (B, H+D)
        dh = dh_prev + dzi[:, :H]
    return loss, grads


def _init_conv_params(rng: np.random.Generator, d_in: int, hidden: int) -> dict:
    """Seeded 1D-CNN init (ref ml7_extended.py:217-248: Conv1D(filters)
    -> Conv1D(filters*2) -> GlobalMaxPooling1D -> Dense -> softmax head;
    here ``hidden`` plays the filters role and the head is the harness's
    binary sigmoid, the same framing as the LSTM/GRU cells). Glorot-ish
    uniform scaled by fan-in per layer."""
    k = 3
    f1, f2, u = hidden, 2 * hidden, 2 * hidden
    s1 = 1.0 / np.sqrt(k * d_in)
    s2 = 1.0 / np.sqrt(k * f1)
    sd = 1.0 / np.sqrt(f2)
    sy = 1.0 / np.sqrt(u)
    return {
        "C1": rng.uniform(-s1, s1, (f1, k, d_in)),
        "cb1": np.zeros(f1),
        "C2": rng.uniform(-s2, s2, (f2, k, f1)),
        "cb2": np.zeros(f2),
        "Wd": rng.uniform(-sd, sd, (f2, u)),
        "bd": np.zeros(u),
        "Wy": rng.uniform(-sy, sy, (u, 1)),
        "by": np.zeros(1),
    }


def _conv_forward(params: dict, X: np.ndarray) -> tuple[np.ndarray, dict]:
    """Two valid 1D convolutions over time (relu), global max pool over
    the surviving time axis, relu dense, sigmoid head. X: (B,T,D) ->
    probabilities (B,); requires T >= 2*(K-1)+1 = 5 at K=3."""
    k = params["C1"].shape[1]
    Xw = np.lib.stride_tricks.sliding_window_view(X, k, axis=1)
    a1 = np.einsum("btdk,fkd->btf", Xw, params["C1"]) + params["cb1"]
    h1 = np.maximum(a1, 0.0)
    H1w = np.lib.stride_tricks.sliding_window_view(h1, k, axis=1)
    a2 = np.einsum("btfk,gkf->btg", H1w, params["C2"]) + params["cb2"]
    h2 = np.maximum(a2, 0.0)
    idx = h2.argmax(axis=1)                                 # (B, F2)
    pool = h2.max(axis=1)                                   # (B, F2)
    ad = pool @ params["Wd"] + params["bd"]
    hd = np.maximum(ad, 0.0)
    logits = (hd @ params["Wy"] + params["by"]).ravel()
    probs = _sigmoid(logits)
    cache = {"Xw": Xw, "a1": a1, "H1w": H1w, "a2": a2, "h2": h2,
             "idx": idx, "pool": pool, "ad": ad, "hd": hd}
    return probs, cache


def _conv_loss_and_grads(
    params: dict, X: np.ndarray, y: np.ndarray, w: np.ndarray
) -> tuple[float, dict]:
    """Weighted BCE + analytic backprop through dense / max-pool (gradient
    routes to the argmax position) / both convolutions
    (finite-difference verified in tests/test_deep.py)."""
    B = X.shape[0]
    k = params["C1"].shape[1]
    probs, c = _conv_forward(params, X)
    eps = 1e-12
    loss = -np.mean(
        w * (y * np.log(probs + eps) + (1 - y) * np.log(1 - probs + eps))
    )
    dlogit = (w * (probs - y) / B)[:, None]
    grads = {"Wy": c["hd"].T @ dlogit, "by": dlogit.sum(axis=0)}
    dhd = dlogit @ params["Wy"].T
    dad = dhd * (c["ad"] > 0)
    grads["Wd"] = c["pool"].T @ dad
    grads["bd"] = dad.sum(axis=0)
    dpool = dad @ params["Wd"].T                            # (B, F2)
    dh2 = np.zeros_like(c["h2"])
    np.put_along_axis(dh2, c["idx"][:, None, :], dpool[:, None, :], axis=1)
    da2 = dh2 * (c["a2"] > 0)
    grads["C2"] = np.einsum("btfk,btg->gkf", c["H1w"], da2)
    grads["cb2"] = da2.sum(axis=(0, 1))
    dh1 = np.zeros((B, c["a1"].shape[1], params["C1"].shape[0]))
    t2 = da2.shape[1]
    for j in range(k):
        dh1[:, j : j + t2, :] += np.einsum(
            "btg,gf->btf", da2, params["C2"][:, j, :]
        )
    da1 = dh1 * (c["a1"] > 0)
    grads["C1"] = np.einsum("btdk,btf->fkd", c["Xw"], da1)
    grads["cb1"] = da1.sum(axis=(0, 1))
    return loss, grads


def _init_cnn_lstm_params(
    rng: np.random.Generator, d_in: int, hidden: int
) -> dict:
    """Seeded CNN-LSTM hybrid init (ref ml7_extended.py:251-283:
    Conv1D(filters) front-end feeding an LSTM, dense head). The conv
    layer draws first, then the LSTM block reuses ``_init_params`` over
    the conv's ``hidden``-channel output."""
    k = 3
    s1 = 1.0 / np.sqrt(k * d_in)
    p = {
        "C1": rng.uniform(-s1, s1, (hidden, k, d_in)),
        "cb1": np.zeros(hidden),
    }
    p.update(_init_params(rng, hidden, hidden))
    return p


_LSTM_KEYS = ("W", "b", "Wy", "by")


def _cnn_lstm_forward(params: dict, X: np.ndarray) -> tuple[np.ndarray, dict]:
    """Valid conv over time (relu) -> LSTM over the shortened sequence ->
    sigmoid head. X: (B,T,D) -> probabilities (B,); requires T >= K."""
    k = params["C1"].shape[1]
    Xw = np.lib.stride_tricks.sliding_window_view(X, k, axis=1)
    a1 = np.einsum("btdk,fkd->btf", Xw, params["C1"]) + params["cb1"]
    h1 = np.maximum(a1, 0.0)
    probs, lcache = _forward({key: params[key] for key in _LSTM_KEYS}, h1)
    return probs, {"Xw": Xw, "a1": a1, "h1": h1, "lstm": lcache}


def _cnn_lstm_loss_and_grads(
    params: dict, X: np.ndarray, y: np.ndarray, w: np.ndarray
) -> tuple[float, dict]:
    """Weighted BCE + analytic gradients through the LSTM BPTT (reusing
    ``_loss_and_grads`` with the input-gradient tap) and the conv
    front-end (finite-difference verified in tests/test_deep.py)."""
    k = params["C1"].shape[1]
    Xw = np.lib.stride_tricks.sliding_window_view(X, k, axis=1)
    a1 = np.einsum("btdk,fkd->btf", Xw, params["C1"]) + params["cb1"]
    h1 = np.maximum(a1, 0.0)
    loss, grads, dS = _loss_and_grads(
        {key: params[key] for key in _LSTM_KEYS}, h1, y, w, return_dX=True
    )
    da1 = dS * (a1 > 0)
    grads = dict(grads)
    grads["C1"] = np.einsum("btdk,btf->fkd", Xw, da1)
    grads["cb1"] = da1.sum(axis=(0, 1))
    return loss, grads


_CELLS = {
    "lstm": None,  # filled below once the LSTM functions exist
    "gru": None,
    "conv1d": None,
    "cnn_lstm": None,
}


def _loss_and_grads(
    params: dict,
    X: np.ndarray,
    y: np.ndarray,
    w: np.ndarray,
    return_dX: bool = False,
):
    """Weighted BCE loss + analytic full-BPTT gradients (verified against
    finite differences in tests/test_deep.py). With ``return_dX`` the
    input gradient (B,T,D) is also returned — the tap the CNN-LSTM
    hybrid's conv front-end backpropagates through."""
    B, T, D = X.shape
    H = params["Wy"].shape[0]
    probs, cache = _forward(params, X)
    eps = 1e-12
    loss = -np.mean(
        w * (y * np.log(probs + eps) + (1 - y) * np.log(1 - probs + eps))
    )
    # d loss / d logits for sigmoid+BCE = w * (p - y) / B
    dlogit = (w * (probs - y) / B)[:, None]                   # (B, 1)
    grads = {
        "W": np.zeros_like(params["W"]),
        "b": np.zeros_like(params["b"]),
        "Wy": cache["h_T"].T @ dlogit,
        "by": dlogit.sum(axis=0),
    }
    dh = dlogit @ params["Wy"].T                              # (B, H)
    dc = np.zeros((B, H))
    dX = np.zeros_like(X) if return_dX else None
    for t in range(T - 1, -1, -1):
        i, f, o, g = (cache[k][t] for k in ("i", "f", "o", "g"))
        tc, c_prev, z = cache["tanh_c"][t], cache["c_prev"][t], cache["z"][t]
        do = dh * tc
        dc = dc + dh * o * (1 - tc * tc)
        di = dc * g
        dg = dc * i
        df = dc * c_prev
        dai = di * i * (1 - i)
        daf = df * f * (1 - f)
        dao = do * o * (1 - o)
        dag = dg * (1 - g * g)
        da = np.concatenate([dai, daf, dao, dag], axis=1)     # (B, 4H)
        grads["W"] += da.T @ z
        grads["b"] += da.sum(axis=0)
        dz = da @ params["W"]                                 # (B, H+D)
        dh = dz[:, :H]
        if return_dX:
            dX[:, t, :] = dz[:, H:]
        dc = dc * f
    if return_dX:
        return loss, grads, dX
    return loss, grads


def _train_seq(
    X: np.ndarray,
    y: np.ndarray,
    hidden: int,
    epochs: int,
    lr: float,
    seed: int,
    cell: str = "lstm",
) -> dict:
    """Full-batch Adam, fixed epochs, seeded init; balanced class weights
    (the reference trains class_weight='balanced'). ``cell`` selects the
    sequence core (lstm | gru | conv1d | cnn_lstm) — same optimizer,
    head, and weighting."""
    init, loss_fn, _fwd = _CELLS[cell]
    rng = np.random.default_rng(seed)
    params = init(rng, X.shape[2], hidden)
    n_pos = max(int(y.sum()), 1)
    n_neg = max(len(y) - int(y.sum()), 1)
    w = np.where(y == 1, len(y) / (2.0 * n_pos), len(y) / (2.0 * n_neg))
    m = {k: np.zeros_like(v) for k, v in params.items()}
    v2 = {k: np.zeros_like(v) for k, v in params.items()}
    b1, b2, eps = 0.9, 0.999, 1e-8
    for step in range(1, epochs + 1):
        _, grads = loss_fn(params, X, y, w)
        for k in params:
            m[k] = b1 * m[k] + (1 - b1) * grads[k].reshape(params[k].shape)
            v2[k] = b2 * v2[k] + (1 - b2) * (
                grads[k].reshape(params[k].shape) ** 2
            )
            mhat = m[k] / (1 - b1**step)
            vhat = v2[k] / (1 - b2**step)
            params[k] = params[k] - lr * mhat / (np.sqrt(vhat) + eps)
    return params


def _auroc(y: np.ndarray, scores: np.ndarray) -> float:
    """Rank AUROC with tie handling (the metrics.auc_score formula in
    numpy)."""
    pos = scores[y == 1]
    neg = scores[y == 0]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    return float((gt + 0.5 * eq) / (len(pos) * len(neg)))


def _seq_fold_cv(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    date_col: str = "date",
    seq_len: int = 14,
    hidden: int = 8,
    epochs: int = 40,
    lr: float = 0.02,
    train_days: int = 14,
    gap_days: int = 0,
    val_days: int = 7,
    seed: int = 42,
    cell: str = "lstm",
) -> DataFrame:
    """ML7 stage: per-temporal-fold recurrent net (``cell``: lstm | gru)
    on trailing ``seq_len``-day feature windows, binary target =
    (label != 0) (episode vs not — the reference's binary framing).
    Returns one row per fold with n_train / n_val, accuracy, macro-F1
    and AUROC on the validation windows.

    Fold groups run concurrently via applyInPandas; features are
    per-fold z-scored with TRAIN statistics only (no leakage). Windows
    are trailing, so a sequence only ever looks BACKWARD — no future
    leakage by construction; a window is assigned to a fold/split by its
    END date, the rolling-origin contract.
    """
    seq = sliding_sequences(
        df.withColumn(
            "_fv", F.array(*[F.col(c).cast("double") for c in feature_cols])
        ),
        date_col,
        "_fv",
        seq_len=seq_len,
    ).select(
        F.col(date_col),
        F.col("sequence"),
        (F.col(label_col) != 0).cast("int").alias("_y"),
    )
    folded = folds_mod.day_folds(
        seq, date_col, train_days, gap_days, val_days
    ).filter(F.col("split") != "gap")

    out_schema = (
        "fold_id bigint, n_train bigint, n_val bigint, "
        "accuracy double, macro_f1 double, auroc double"
    )
    d_in = len(feature_cols)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["fold_id"].iloc[0])
        tr = pdf[pdf["split"] == "train"]
        va = pdf[pdf["split"] == "val"]
        if len(tr) < 4 or len(va) == 0 or tr["_y"].nunique() < 2:
            return pd.DataFrame(
                {
                    "fold_id": [fid],
                    "n_train": [len(tr)],
                    "n_val": [len(va)],
                    "accuracy": [float("nan")],
                    "macro_f1": [float("nan")],
                    "auroc": [float("nan")],
                }
            )

        def stack(part: pd.DataFrame) -> np.ndarray:
            return np.array(
                [np.stack([np.asarray(v) for v in s]) for s in part["sequence"]]
            ).reshape(len(part), seq_len, d_in)

        Xtr, Xva = stack(tr), stack(va)
        ytr = tr["_y"].to_numpy().astype(float)
        yva = va["_y"].to_numpy().astype(float)
        mu = Xtr.reshape(-1, d_in).mean(axis=0)
        sd = Xtr.reshape(-1, d_in).std(axis=0)
        sd[sd == 0] = 1.0
        Xtr = (Xtr - mu) / sd
        Xva = (Xva - mu) / sd
        params = _train_seq(Xtr, ytr, hidden, epochs, lr, seed + fid, cell)
        probs, _ = _CELLS[cell][2](params, Xva)
        pred = (probs >= 0.5).astype(float)
        acc = float((pred == yva).mean())
        f1s = []
        for cls in (0.0, 1.0):
            tp = float(((pred == cls) & (yva == cls)).sum())
            fp = float(((pred == cls) & (yva != cls)).sum())
            fn = float(((pred != cls) & (yva == cls)).sum())
            denom = 2 * tp + fp + fn
            f1s.append(2 * tp / denom if denom > 0 else 0.0)
        return pd.DataFrame(
            {
                "fold_id": [fid],
                "n_train": [len(tr)],
                "n_val": [len(va)],
                "accuracy": [round(acc, 6)],
                "macro_f1": [round(float(np.mean(f1s)), 6)],
                "auroc": [round(_auroc(yva, probs), 6)],
            }
        )

    return (
        folded.groupBy("fold_id")
        .applyInPandas(run, out_schema)
        .orderBy("fold_id")
    )


_CELLS["lstm"] = (_init_params, _loss_and_grads, _forward)
_CELLS["gru"] = (_init_gru_params, _gru_loss_and_grads, _gru_forward)
_CELLS["conv1d"] = (_init_conv_params, _conv_loss_and_grads, _conv_forward)
_CELLS["cnn_lstm"] = (
    _init_cnn_lstm_params,
    _cnn_lstm_loss_and_grads,
    _cnn_lstm_forward,
)


def _train_lstm(X, y, hidden, epochs, lr, seed):
    """Back-compat alias for the generalized trainer."""
    return _train_seq(X, y, hidden, epochs, lr, seed, cell="lstm")


def lstm_fold_cv(df, feature_cols, label_col, **kw) -> DataFrame:
    """Per-temporal-fold LSTM CV (ref ml7_analysis.py:238-320)."""
    return _seq_fold_cv(df, feature_cols, label_col, cell="lstm", **kw)


def gru_fold_cv(df, feature_cols, label_col, **kw) -> DataFrame:
    """Per-temporal-fold GRU CV — the next config in the reference's
    extended sequence-model grid (ref ml7_extended.py:186-216: the CFG
    grid's GRU entry, same windows/folds/metrics as the LSTM). Reuses
    the whole harness: distributed window building, fold-concurrent
    applyInPandas training, train-only z-scoring, seeded determinism;
    only the recurrent core differs (Cho et al. 2014 GRU with analytic
    full-BPTT gradients, finite-difference-verified)."""
    return _seq_fold_cv(df, feature_cols, label_col, cell="gru", **kw)


def conv1d_fold_cv(df, feature_cols, label_col, **kw) -> DataFrame:
    """Per-temporal-fold 1D-CNN CV (ref ml7_extended.py:217-248: the CFG
    grid's Conv1D config — two stacked valid convolutions, global max
    pool, relu dense, head). Same harness as the recurrent cells; the
    ``seq_len`` must be >= 5 so two kernel-3 valid convs leave at least
    one time step. Gradients (incl. the argmax-routed max-pool) are
    finite-difference-verified in tests/test_deep.py."""
    return _seq_fold_cv(df, feature_cols, label_col, cell="conv1d", **kw)


def cnn_lstm_fold_cv(df, feature_cols, label_col, **kw) -> DataFrame:
    """Per-temporal-fold CNN-LSTM hybrid CV (ref ml7_extended.py:251-283:
    Conv1D front-end feeding an LSTM). The conv shortens the sequence by
    K-1=2 steps before the LSTM consumes it; backprop reuses the LSTM
    BPTT with its input-gradient tap, then flows through the conv.
    Completes the reference's 4-config sequence-model grid (LSTM / GRU /
    Conv1D / CNN-LSTM) on one shared, finite-difference-verified
    harness."""
    return _seq_fold_cv(df, feature_cols, label_col, cell="cnn_lstm", **kw)
