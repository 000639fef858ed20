"""Sanitizer-mode tests: checkify catches injected NaNs; id validation
catches out-of-range ids that XLA would silently clamp."""

import jax
import numpy as np
import pytest

from graphqembed_tpu.config import GQEConfig
from graphqembed_tpu.data.queries import group_by_formula, make_batch
from graphqembed_tpu.data.sampling import QuerySampler
from graphqembed_tpu.models.params import init_params
from graphqembed_tpu.utils import checked_margin_loss, validate_ids


def test_validate_ids(graph):
    n = graph.schema.n_nodes
    validate_ids(np.array([0, n - 1]), n)
    with pytest.raises(ValueError, match="out-of-range"):
        validate_ids(np.array([0, n]), n)
    with pytest.raises(ValueError, match="out-of-range"):
        validate_ids(np.array([-1]), n)


def test_checked_loss_clean_and_poisoned(graph):
    cfg = GQEConfig(embed_dim=16, projection="transe")
    params = init_params(cfg, graph.schema, jax.random.key(0))
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=5)
    qs = max(group_by_formula(s.sample_many("1p", 20)).values(), key=len)
    b = make_batch(graph.schema, qs, batch_size=len(qs), neg_width=1,
                   rng=np.random.default_rng(0))
    run = checked_margin_loss(cfg)
    loss = run(params, "1p", b.anchors, b.rels, np.int32(b.inter_mode_id),
               b.targets, b.negs[:, 0], b.row_mask)
    assert np.isfinite(float(loss))

    poisoned = dict(params)
    poisoned["table"] = params["table"].at[int(b.anchors[0, 0])].set(np.nan)
    with pytest.raises(Exception):  # checkify JaxRuntimeError
        run(poisoned, "1p", b.anchors, b.rels, np.int32(b.inter_mode_id),
            b.targets, b.negs[:, 0], b.row_mask)
