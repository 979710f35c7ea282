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
    np.savez_compressed(path, **out)


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
