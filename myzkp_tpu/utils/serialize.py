"""Key / proof persistence: SRS and proving keys as .npz checkpoints.

The reference has NO checkpoint/resume facility (SURVEY.md section 5); its
only persistence is the Fiat-Shamir stream's bincode wire format
(fiat_shamir.rs:37-48).  This module adds the production-side counterpart:
device point batches (limb arrays) and limb scalars round-trip through a
single compressed .npz so a trusted setup / Pinocchio proving key is
generated once and reloaded across runs.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import weierstrass as wst


def save_point_batches(path: str, **named_points) -> None:
    """Save named Point batches (and plain arrays) to one .npz file."""
    out: dict = {}
    structures: dict = {}
    for name, val in named_points.items():
        if isinstance(val, wst.Point):
            leaves, treedef = jax.tree_util.tree_flatten(val)
            structures[name] = treedef
            out[f"pt:{name}:n"] = np.asarray(len(leaves))
            for i, leaf in enumerate(leaves):
                out[f"pt:{name}:{i}"] = np.asarray(leaf)
            # record whether coords are tuples (Fq2) by leaf count
        else:
            out[f"arr:{name}"] = np.asarray(val)
    # Uncompressed (coordinates are Montgomery-domain limbs, effectively
    # incompressible) and atomic: a reader never sees a partial file even
    # if the writer is killed mid-save (bench.py saves from a background
    # thread that may outlive its budget).
    tmp = f"{path}.tmp{os.getpid()}.npz"
    try:
        np.savez(tmp, **out)
        os.replace(tmp, path)
    finally:
        # a killed writer must not leave a ~500 MB orphan accumulating in
        # the keys dir (advisor r4); best-effort — replace() normally
        # already consumed tmp
        try:
            os.unlink(tmp)
        except OSError:
            pass


def load_point_batches(path: str) -> dict:
    """Inverse of save_point_batches.

    Points with 3 leaves load as G1-style Point(x, y, z); 6 leaves load as
    G2-style Point((x0,x1), (y0,y1), (z0,z1)).
    """
    data = np.load(path)
    out: dict = {}
    names_pt = {k.split(":")[1] for k in data.files if k.startswith("pt:")}
    for name in names_pt:
        n = int(data[f"pt:{name}:n"])
        leaves = [jnp.asarray(data[f"pt:{name}:{i}"]) for i in range(n)]
        if n == 3:
            out[name] = wst.Point(*leaves)
        elif n == 6:
            out[name] = wst.Point(
                (leaves[0], leaves[1]), (leaves[2], leaves[3]),
                (leaves[4], leaves[5]))
        else:
            raise ValueError(f"unexpected leaf count {n} for point {name}")
    for k in data.files:
        if k.startswith("arr:"):
            out[k[4:]] = jnp.asarray(data[k])
    return out


def save_kzg_pk(path: str, pk) -> None:
    save_point_batches(path, powers1=pk.powers1, powers2=pk.powers2)


def load_kzg_pk(path: str):
    from ..commit.kzg import KZGPublicKey

    d = load_point_batches(path)
    return KZGPublicKey(powers1=d["powers1"], powers2=d["powers2"])


def save_pinocchio_pk(path: str, pk) -> None:
    fields = {f.name: getattr(pk, f.name)
              for f in dataclasses.fields(pk)}
    save_point_batches(path, **fields)


def load_pinocchio_pk(path: str):
    from ..snark.pinocchio import PinocchioProofKey

    return PinocchioProofKey(**load_point_batches(path))


# ---------------------------------------------------------------------------
# Host-point (verification key) persistence: coordinates as JSON ints
# ---------------------------------------------------------------------------

def _py_point_to_ints(p):
    # group tag from the curve's b coefficient type (works for infinity too)
    grp = "g2" if hasattr(p.curve.b, "c") else "g1"
    if p.inf:
        return [grp, None]
    if grp == "g2":
        return [grp, [[int(c.v) for c in p.x.c], [int(c.v) for c in p.y.c]]]
    return [grp, [int(p.x.v), int(p.y.v)]]


def _py_point_from_ints(v):
    from ..curves import bn254

    grp, coords = v
    if grp == "g2":
        if coords is None:
            return bn254.curve_g2.infinity()
        x, y = coords
        return bn254.curve_g2.point(bn254.Fq2([int(x[0]), int(x[1])]),
                                    bn254.Fq2([int(y[0]), int(y[1])]))
    if coords is None:
        return bn254.curve_g1.infinity()
    x, y = coords
    return bn254.curve_g1.point(bn254.Fq(int(x)), bn254.Fq(int(y)))


def save_pinocchio_vk(path: str, vk) -> None:
    import json

    out = {f.name: _py_point_to_ints(getattr(vk, f.name))
           for f in dataclasses.fields(vk)}
    tmp = f"{path}.tmp"
    with open(tmp, "w") as fh:
        json.dump(out, fh)
    import os

    os.replace(tmp, path)


def load_pinocchio_vk(path: str):
    import json

    from ..snark.pinocchio import PinocchioVerificationKey

    with open(path) as fh:
        data = json.load(fh)
    return PinocchioVerificationKey(
        **{k: _py_point_from_ints(v) for k, v in data.items()})
