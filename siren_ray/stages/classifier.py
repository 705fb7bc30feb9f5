"""Model-based quality filtering: a feature-hashed LINEAR classifier
(logistic regression) trained with distributed synchronous full-batch
Newton/IRLS (gradient-descent fallback for very wide feature spaces),
then applied map-only — the CCNet / GPT-3-recipe
"quality classifier" stage (Wenzek et al. 2020 §4.3; Brown et al. 2020
App. A train a linear classifier over text features and keep/sample
documents by its score). A feature-hash linear model (Weinberger et
al. 2009) stands in for fastText, which is not in this container; the
pipeline SHAPE is identical: featurize -> train on labeled docs ->
broadcast the model -> score every doc map-only -> threshold or
importance-sample downstream.

No reference counterpart (the reference has no model stages,
SURVEY.md §2.5); engine addition from the task brief's
LLM-data-pipeline list.

Scale shape:
- Featurization runs ONCE (map-only) and the (label, features) dataset
  pins for the training passes (multi-pass contract, CLAUDE.md).
- Each epoch is ONE pass: every block emits its gradient (and, on the
  Newton path, Hessian) partial SPLIT into register-range chunks, and
  a groupby(chunk) tree-merges them — the same discipline as
  relational.approx_distinct, so the driver receives a bounded number
  of floats per epoch regardless of block count.
- EVERY EPOCH IS A FULL CORPUS PASS, so pass count is the training
  cost at scale: the default IRLS path converges quadratically in
  ~5-8 passes where GD needs tens (method="auto" keeps IRLS while the
  (dim+1)^2 Hessian partial stays small, falls back to GD above).
- Both paths are deterministic up to float association; tests assert
  parity with single-array numpy references and invariance to
  repartitioning.
- Scoring broadcasts the (dim+1)-float weight vector via ``ray.put``
  once and is pure map.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..util import hash_strings

_MERGE_CHUNKS = 16


def hash_features(texts: list, dim: int,
                  max_words: int = 2048) -> np.ndarray:
    """Signed feature-hash bag-of-words, L2-normalized — the SAME
    featurization as functions.textstats.hashed_text_embedding (word
    hash -> bucket via low bits, sign via bit 32), returned as a dense
    float64 matrix for the training math."""
    out = np.zeros((len(texts), dim), dtype=np.float64)
    words: list[str] = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        w = (t or "").lower().split()[:max_words]
        lens[i] = len(w)
        words.extend(w)
    if words:
        h = hash_strings(words).astype(np.uint64)
        bucket = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
        row = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        np.add.at(out, (row, bucket), sign)
    norms = np.linalg.norm(out, axis=1)
    norms[norms == 0] = 1.0
    out /= norms[:, None]
    return out


@dataclass
class LinearQualityModel:
    weights: np.ndarray  # dim floats
    bias: float
    dim: int
    epochs_run: int
    final_loss: float  # mean log-loss over the training set


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(z, -30.0, 30.0)))


# dims up to this run Newton (per-block Hessian partial = (dim+1)^2
# float64s — 516 KB at dim=256, 8.1 MB at the cap); beyond it the
# Hessian partial outweighs the saved passes and GD takes over
_NEWTON_MAX_DIM = 1024


def train_quality_classifier(ds, *, label_col: str, text_col: str = "text",
                             dim: int = 256, epochs: int = 40,
                             lr: float = 2.0, l2: float = 1e-4,
                             method: str = "auto", tol: float = 1e-8,
                             pin_input: bool = True) -> LinearQualityModel:
    """Distributed full-batch logistic regression. ``label_col`` must be
    0/1 (castable to float). Returns the broadcastable model.

    ``method``: ``"newton"`` = IRLS — each pass also accumulates the
    (dim+1)² Hessian partials, so the driver takes a Newton step and
    the loss converges quadratically in ~5-8 FULL-CORPUS PASSES instead
    of GD's tens (every epoch is a complete pass over the corpus, so at
    100 TB the pass count IS the training cost); stops early when the
    step's max component drops below ``tol``. ``"gd"`` = the original
    gradient descent (partials are dim+1 floats — the fallback when the
    Hessian partial itself would dominate the shuffle). ``"auto"``
    (default) picks newton for dim <= 1024, gd above — scale-safe
    without a kwarg, the scheduler="auto" discipline. ``epochs`` caps
    either loop."""
    import ray

    from ..util import ensure_arrow, pin_for_multipass

    if method == "auto":
        method = "newton" if dim <= _NEWTON_MAX_DIM else "gd"
    if method not in ("newton", "gd"):
        raise ValueError(f"unknown method {method!r}")
    newton = method == "newton"

    def _featurize(t: pa.Table) -> pa.Table:
        X = hash_features(t[text_col].to_pylist(), dim)
        y = np.asarray(t[label_col], dtype=np.float64)
        return pa.table({
            "_y": pa.array(y, pa.float64()),
            "_x": pa.FixedSizeListArray.from_arrays(
                pa.array(X.reshape(-1), pa.float64()), dim),
        })

    feats = pin_for_multipass(
        ds.map_batches(_featurize, batch_format="pyarrow"),
        enabled=pin_input)

    d1 = dim + 1  # augmented [w; b]
    # flat partial layout: [grad (d1), loss_sum] + newton: [H (d1*d1)]
    g_dim = d1 + 1 + (d1 * d1 if newton else 0)
    pad = (-g_dim) % _MERGE_CHUNKS
    chunk_len = (g_dim + pad) // _MERGE_CHUNKS

    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    n_total = 0
    loss = float("nan")
    epochs_run = 0
    for epoch in range(epochs):
        w_ref = ray.put((w, b))

        def _grad(t: pa.Table) -> pa.Table:
            ww, bb = ray.get(w_ref)
            blk = ensure_arrow(t)
            y = np.asarray(blk["_y"], dtype=np.float64)
            X = np.asarray(
                blk["_x"].combine_chunks().flatten(), dtype=np.float64
            ).reshape(len(y), dim)
            p = _sigmoid(X @ ww + bb)
            err = p - y
            eps = 1e-12
            ll = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
            parts = [X.T @ err, [err.sum()], [ll.sum()]]
            if newton:
                # augmented-design Hessian partial: Xa.T @ diag(wgt) @ Xa
                # with Xa = [X | 1]
                wgt = p * (1.0 - p)
                Xw = X * wgt[:, None]
                H = np.empty((d1, d1), dtype=np.float64)
                H[:dim, :dim] = X.T @ Xw
                H[:dim, dim] = Xw.sum(axis=0)
                H[dim, :dim] = H[:dim, dim]
                H[dim, dim] = wgt.sum()
                parts.append(H.reshape(-1))
            parts.append(np.zeros(pad))
            g = np.concatenate(parts)
            chunks = g.reshape(_MERGE_CHUNKS, chunk_len)
            return pa.table({
                "chunk": pa.array(np.arange(_MERGE_CHUNKS, dtype=np.int64)),
                "part": pa.FixedSizeListArray.from_arrays(
                    pa.array(chunks.reshape(-1), pa.float64()), chunk_len),
                "n": pa.array(np.full(_MERGE_CHUNKS, len(y), np.int64)),
            })

        def _merge(t: pa.Table) -> pa.Table:
            # one row per source block in this chunk group: sum the
            # gradient range and the row counts (every chunk group sees
            # every block once, so each merged row carries n_total)
            vals = np.asarray(
                t["part"].combine_chunks().flatten(), dtype=np.float64
            ).reshape(t.num_rows, chunk_len)
            n = int(np.asarray(t["n"], dtype=np.int64).sum())
            return pa.table({
                "chunk": t["chunk"].slice(0, 1),
                "part": pa.FixedSizeListArray.from_arrays(
                    pa.array(vals.sum(axis=0), pa.float64()), chunk_len),
                "n": pa.array([n], pa.int64()),
            })

        rows = (
            feats.map_batches(_grad, batch_format="pyarrow")
            .groupby("chunk")
            .map_groups(_merge, batch_format="pyarrow")
            .take_all()
        )
        g_full = np.zeros(_MERGE_CHUNKS * chunk_len, dtype=np.float64)
        n_total = 0
        for rrow in rows:
            cid = int(rrow["chunk"])
            g_full[cid * chunk_len:(cid + 1) * chunk_len] = np.asarray(
                rrow["part"], dtype=np.float64)
            if cid == 0:
                n_total = int(rrow["n"])
        if n_total == 0:
            raise ValueError("train_quality_classifier: empty input")
        grad_w = g_full[:dim] / n_total
        grad_b = g_full[dim] / n_total
        loss = g_full[dim + 1] / n_total
        epochs_run = epoch + 1
        if newton:
            H = g_full[d1 + 1:d1 + 1 + d1 * d1].reshape(d1, d1) / n_total
            # L2 on weights only (never the bias) + tiny Levenberg
            # damping so a separable corpus can't make H singular
            H[np.arange(dim), np.arange(dim)] += l2
            H[np.arange(d1), np.arange(d1)] += 1e-9
            g_aug = np.concatenate([grad_w + l2 * w, [grad_b]])
            try:
                step = np.linalg.solve(H, g_aug)
            except np.linalg.LinAlgError:
                step, *_ = np.linalg.lstsq(H, g_aug, rcond=None)
            w = w - step[:dim]
            b = b - step[dim]
            if np.abs(step).max() < tol:
                break
        else:
            w = w - lr * (grad_w + l2 * w)
            b = b - lr * grad_b
    return LinearQualityModel(weights=w, bias=float(b), dim=dim,
                              epochs_run=epochs_run, final_loss=float(loss))


def score_quality(ds, model: LinearQualityModel, *,
                  text_col: str = "text", out_col: str = "quality_prob"):
    """Map-only scoring: appends ``out_col`` = P(label=1 | text). The
    (dim+1)-float model broadcasts once via ``ray.put``."""
    import ray

    m_ref = ray.put((model.weights, model.bias, model.dim))

    def _score(t: pa.Table) -> pa.Table:
        ww, bb, d = ray.get(m_ref)
        X = hash_features(t[text_col].to_pylist(), d)
        p = _sigmoid(X @ ww + bb)
        return t.append_column(out_col, pa.array(p, pa.float64()))

    return ds.map_batches(_score, batch_format="pyarrow")


def train_reference_numpy(texts: list, labels: np.ndarray, *, dim: int,
                          epochs: int, lr: float = 2.0,
                          l2: float = 1e-4) -> tuple[np.ndarray, float]:
    """Single-array reference implementation (tests assert the
    distributed trainer matches it to float-association tolerance)."""
    X = hash_features(texts, dim)
    y = np.asarray(labels, dtype=np.float64)
    w = np.zeros(dim)
    b = 0.0
    for _ in range(epochs):
        p = _sigmoid(X @ w + b)
        err = p - y
        w = w - lr * (X.T @ err / len(y) + l2 * w)
        b = b - lr * err.sum() / len(y)
    return w, float(b)


def train_reference_newton(texts: list, labels: np.ndarray, *, dim: int,
                           epochs: int, l2: float = 1e-4,
                           tol: float = 1e-8) -> tuple[np.ndarray, float]:
    """Single-array IRLS reference mirroring the distributed Newton
    path step for step (same damping, same stop rule)."""
    X = hash_features(texts, dim)
    y = np.asarray(labels, dtype=np.float64)
    n = len(y)
    d1 = dim + 1
    w = np.zeros(dim)
    b = 0.0
    for _ in range(epochs):
        p = _sigmoid(X @ w + b)
        err = p - y
        wgt = p * (1.0 - p)
        Xw = X * wgt[:, None]
        H = np.empty((d1, d1))
        H[:dim, :dim] = X.T @ Xw
        H[:dim, dim] = Xw.sum(axis=0)
        H[dim, :dim] = H[:dim, dim]
        H[dim, dim] = wgt.sum()
        H /= n
        H[np.arange(dim), np.arange(dim)] += l2
        H[np.arange(d1), np.arange(d1)] += 1e-9
        g_aug = np.concatenate([X.T @ err / n + l2 * w, [err.sum() / n]])
        step = np.linalg.solve(H, g_aug)
        w = w - step[:dim]
        b = b - step[dim]
        if np.abs(step).max() < tol:
            break
    return w, float(b)
