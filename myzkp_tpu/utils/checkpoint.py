"""Checkpoint / resume for long proving jobs.

The reference has no checkpoint facility at all (SURVEY.md section 5: its
only persistence is the Fiat-Shamir bincode stream, fiat_shamir.rs:37-48).
Production MSMs over 2^24+ points run for minutes per proof; this module
makes them restartable: the point set is processed in chunks, and after
each chunk the running partial sum (a single projective point) plus the
chunk cursor are flushed to an .npz file.  A killed job re-launched with
the same path continues from the last finished chunk.

The same pattern (pure accumulation over independent slices) applies to
any linear reduction: batched KZG commitments, per-window MSM partials,
trace-column interpolations.
"""

from __future__ import annotations

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import msm as _msm, weierstrass as wst


def _save_state(path: str, idx: int, acc: wst.Point) -> None:
    """Atomic write: partial sum + next chunk index."""
    leaves = jax.tree_util.tree_leaves(acc)
    out = {f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)}
    out["idx"] = np.asarray(idx)
    out["nleaves"] = np.asarray(len(leaves))
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **out)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _load_state(path: str):
    data = np.load(path)
    n = int(data["nleaves"])
    leaves = [jnp.asarray(data[f"leaf{i}"]) for i in range(n)]
    if n == 3:
        pt = wst.Point(*leaves)
    else:  # G2: 2 limb arrays per coordinate
        pt = wst.Point(*[tuple(leaves[2 * i : 2 * i + 2]) for i in range(3)])
    return int(data["idx"]), pt


def msm_resumable(F, b3, points: wst.Point, s_limbs, path: str,
                  chunk: int = 1 << 16, keep: bool = False,
                  **msm_kw) -> wst.Point:
    """sum_i [s_i] P_i, checkpointed to ``path`` after every chunk.

    Equivalent to ``msm.msm_pippenger`` (the MSM of the whole point set is
    the EC sum of the per-chunk MSMs).  If ``path`` exists, resumes after
    the last finished chunk.  The checkpoint is removed on completion
    unless ``keep``.
    """
    n = s_limbs.shape[1]
    start, acc = 0, wst.infinity(F, ())
    if os.path.exists(path):
        start, acc = _load_state(path)
    off = start * chunk
    while off < n:
        hi = min(off + chunk, n)
        pts = jax.tree_util.tree_map(lambda a: a[:, off:hi], points)
        part = _msm.msm(F, b3, pts, s_limbs[:, off:hi], **msm_kw)
        acc = wst.padd(F, b3, acc, part)
        jax.block_until_ready(jax.tree_util.tree_leaves(acc)[0])
        start += 1
        _save_state(path, start, acc)
        off = hi
    if not keep and os.path.exists(path):
        os.unlink(path)
    return acc
