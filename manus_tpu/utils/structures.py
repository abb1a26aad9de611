"""Core pytree dataclasses: skeleton bones.

Counterpart of /root/reference/src/utils/structures.py:7-26, as a frozen
jax pytree so poses can flow through jitted LBS / FK code.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Bones:
    """A (possibly batched) skeleton snapshot.

    heads/tails: [J, 3] bone endpoints; transforms: [J, 4, 4] bone matrices
    (armature->world); eulers: [J, 3] local joint angles. kintree is static
    metadata ({str(idx): parent_idx}).
    """

    heads: Any
    tails: Any
    transforms: Any
    eulers: Optional[Any] = None
    root_translation: Optional[Any] = None
    root_rotation: Optional[Any] = None
    kintree: Optional[dict] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    bnames: Optional[tuple] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    def __getitem__(self, idx):
        return jax.tree.map(lambda x: x[idx], self)

    @property
    def num_bones(self) -> int:
        return self.transforms.shape[-3]

    def keypoints(self):
        """[J+1, 3] skeleton keypoints = first head + all tails.

        Matches the reference usage (hand_dynamic.py:200-202).
        """
        import jax.numpy as jnp

        return jnp.concatenate([self.heads[..., :1, :], self.tails], axis=-2)
