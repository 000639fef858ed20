"""Debug-build validation (SURVEY.md §6 "race detection / sanitizers" row):
XLA programs are data-race-free by construction, so runtime risk concentrates
in numerics (NaN/Inf) and indexing (out-of-bounds ids clamp silently in XLA
gathers). This module provides checkify-instrumented wrappers and input
validators used in debug runs and tests — the framework's sanitizer story.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from graphqembed_tpu.config import GQEConfig
from graphqembed_tpu.models import gqe


def validate_ids(ids, n_rows: int, name: str = "ids") -> None:
    """Host-side hard validation of id arrays before device upload."""
    import numpy as np

    a = np.asarray(ids)
    if a.size == 0:
        return
    if a.min() < 0 or a.max() >= n_rows:
        raise ValueError(
            f"{name}: out-of-range node id (min={a.min()}, max={a.max()}, "
            f"table rows={n_rows}) — silent clamping would corrupt training")


def checked_margin_loss(cfg: GQEConfig):
    """checkify-wrapped margin loss: raises on NaN/Inf appearing anywhere in
    the computation and on out-of-bounds gathers (debug builds only — this
    disables some fusion)."""

    def loss(params, structure, anchors, rels, inter_mode_id, targets, negs,
             row_mask):
        l = gqe.margin_loss(cfg, params, structure, anchors, rels,
                            inter_mode_id, targets, negs, row_mask)
        checkify.check(jnp.isfinite(l), "margin loss is not finite: {l}", l=l)
        return l

    checked = checkify.checkify(
        loss, errors=checkify.float_checks | checkify.index_checks)

    def run(params, structure, anchors, rels, inter_mode_id, targets, negs,
            row_mask):
        err, out = checked(params, structure, anchors, rels, inter_mode_id,
                           targets, negs, row_mask)
        err.throw()
        return out

    return run
