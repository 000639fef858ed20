"""Where does the bf16-storage step's time go? (round-3 perf lever,
docs/DESIGN.md §10.) Times, on the real chip with Theil-Sen fenced slopes:

  1. full train step per variant (fp32-dense / bf16-dense-fused), at a large
     chunk size to drown dispatch overhead;
  2. the Adam update ALONE (same leaves, synthetic grads) per variant;
  3. the fwd+bwd ALONE (loss + grad, no optimizer) per precision.

Prints one JSON line per measurement.
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def theil_sen(run, windows=(300, 1200, 2400), reps=2):
    # spike-guarded shared harness (training/profiling.py): auto-widens the
    # window set until the slope is positive with bounded IQR — the r03
    # negative-slope arm can no longer be silently reported
    from graphqembed_tpu.training.profiling import fenced_theil_sen

    slope, info = fenced_theil_sen(run, windows=windows, reps=reps)
    if info["widened"]:
        print(json.dumps({"probe_widened": info}), flush=True)
    return slope


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_gqe_xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.graph.synthetic import synthetic_graph
    from graphqembed_tpu.models import gqe
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training.device_data import (
        DeviceTrainData,
        FusedAdamOpt,
        make_scan_train_step,
    )

    graph = synthetic_graph(seed=0, scale=40.0, avg_degree=10.0)
    base = GQEConfig(embed_dim=128, projection="bilinear",
                     intersection="min", batch_size=512, lr=0.01)
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=30)
    queries = s.sample_many("3i", 1500)
    data = DeviceTrainData(graph.schema, queries)
    pool = data.pools["3i"]
    print(json.dumps({"n_nodes": graph.schema.n_nodes,
                      "n_rels": graph.schema.n_relations}), flush=True)

    variants = {
        "fp32": base,
        "bf16": dataclasses.replace(base, compute_dtype="bfloat16",
                                    storage_dtype="bfloat16"),
        "bf16-compute-only": dataclasses.replace(
            base, compute_dtype="bfloat16"),
    }

    for name, cfg in variants.items():
        params = init_params(cfg, graph.schema, jax.random.key(0))
        if cfg.storage_dtype == "bfloat16":
            opt = FusedAdamOpt(cfg.lr)
        else:
            opt = optax.adam(cfg.lr)
        opt_state = opt.init(params)
        scan = make_scan_train_step(cfg, opt)
        state = {"p": params, "o": opt_state}

        def run(n, state=state, scan=scan):
            state["p"], state["o"], loss = scan(
                state["p"], state["o"], pool, "3i", jax.random.key(1), n,
                np.float32(1.0), False)
            return jax.tree.leaves(state["p"])[0][:1, :1]

        us = theil_sen(run) * 1e6
        print(json.dumps({"meas": "full_step", "variant": name,
                          "us_per_step": round(us, 1),
                          "qps": round(512 / us * 1e6, 0)}), flush=True)

        # fwd+bwd only (scan of value_and_grad, fold grads into carry probe)
        # (the full-step scan DONATED the original params; re-init)
        params = init_params(cfg, graph.schema, jax.random.key(0))
        opt_state = opt.init(params)
        import functools

        @functools.partial(jax.jit, static_argnames=("n",))
        def fwdbwd(params, n, cfg=cfg):
            def body(c, t):
                k = jax.random.fold_in(jax.random.key(2), t)
                idx = jax.random.randint(k, (cfg.batch_size,), 0, pool.n)
                neg = pool.negs[idx][:, 0]

                def loss_fn(p):
                    # the production scan path (one fused gather; see
                    # make_scan_train_step) — the old margin_loss_rows
                    # five-gather variant measured within ~5% of this at
                    # 3i, so the r03 fwd/bwd wall is NOT gather-count-bound
                    return gqe.margin_loss_rows_onegather(
                        cfg, p, "3i", pool.anchors[idx], pool.rels[idx],
                        pool.inter_modes[idx], pool.targets[idx], neg,
                        jnp.ones(cfg.batch_size, jnp.bool_))

                loss, grads = jax.value_and_grad(loss_fn)(params)
                # chain EVERY grad leaf into the carry — probing only one
                # leaf lets XLA dead-code-eliminate the others (measured:
                # the dense table-grad scatter vanished entirely)
                probe = sum(g.astype(jnp.float32).reshape(-1)[0] * 1e-30
                            for g in jax.tree.leaves(grads))
                return c + loss + probe, None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return out

        us = theil_sen(lambda n: fwdbwd(params, n)) * 1e6
        print(json.dumps({"meas": "fwd_bwd_only", "variant": name,
                          "us_per_step": round(us, 1)}), flush=True)

        # Adam only: same leaves, fixed grads, scan of updates
        grads = jax.tree.map(lambda x: jnp.full(x.shape, 1e-3, x.dtype),
                             params)

        if isinstance(opt, FusedAdamOpt):
            @functools.partial(jax.jit, static_argnames=("n",),
                               donate_argnames=("params", "st"))
            def adam_only(params, st, n):
                def body(carry, t):
                    p, s = carry
                    p, s = opt.apply(p, grads, s)
                    return (p, s), None
                (p, s), _ = jax.lax.scan(body, (params, st), jnp.arange(n))
                return p, s
        else:
            @functools.partial(jax.jit, static_argnames=("n",),
                               donate_argnames=("params", "st"))
            def adam_only(params, st, n):
                def body(carry, t):
                    p, s = carry
                    u, s = opt.update(grads, s, p)
                    return (optax.apply_updates(p, u), s), None
                (p, s), _ = jax.lax.scan(body, (params, st), jnp.arange(n))
                return p, s

        st8 = {"p": params, "s": opt_state}

        def run_adam(n, st8=st8):
            st8["p"], st8["s"] = adam_only(st8["p"], st8["s"], n)
            return jax.tree.leaves(st8["p"])[0][:1, :1]

        us = theil_sen(run_adam) * 1e6
        print(json.dumps({"meas": "adam_only", "variant": name,
                          "us_per_step": round(us, 1)}), flush=True)


if __name__ == "__main__":
    main()
