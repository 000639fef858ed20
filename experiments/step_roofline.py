"""Step-level roofline (VERDICT r1 item 7): account the FULL train step —
forward + backward + Adam — against MXU FLOPs and HBM bytes at bench shapes,
answering "what fraction of speed-of-light is the measured throughput?".

Two parts:
- cost: AOT-compile the single train step for a v5e target (deviceless) and
  read the compiler's own cost model (flops, bytes accessed);
- measurement: on the real chip, time (a) a control matmul at the step's
  precision to get the achievable MXU rate, (b) the scan train step itself
  (bench.py methodology, short form).

Writes docs/artifacts/step_roofline.json and prints the DESIGN.md table.
Run: python experiments/step_roofline.py [--no-measure]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

HBM_PEAK_GBS = 819.0      # v5e HBM bandwidth (public spec)
BF16_PEAK_TFLOPS = 197.0  # v5e bf16 MXU peak (public spec)


def build(cfg_overrides=None):
    import jax

    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.graph.synthetic import synthetic_graph
    from graphqembed_tpu.models.params import init_params

    graph = synthetic_graph(seed=0, scale=40.0, avg_degree=10.0)
    cfg = GQEConfig(embed_dim=128, projection="bilinear",
                    intersection="min", batch_size=512, lr=0.01,
                    **(cfg_overrides or {}))
    params = init_params(cfg, graph.schema, jax.random.key(0))
    return graph, cfg, params


def make_step(cfg, optimizer):
    """The per-scan-iteration body as a standalone function — r05: the
    PRODUCTION formulation (margin_loss_rows_onegather: one fused table
    gather forward, one dense cotangent with sorted-scatter backward —
    training/device_data.py::_train_body path 2), which is what bench.py
    actually runs; the r02 version of this file modeled the older
    margin_loss_rows step."""
    import jax
    import optax

    from graphqembed_tpu.models import gqe

    def step(params, opt_state, anchors, rels, inter_modes, targets, negs):
        def loss_fn(p):
            import jax.numpy as jnp
            return gqe.margin_loss_rows_onegather(
                cfg, p, "3i", anchors, rels, inter_modes, targets, negs,
                jnp.ones(anchors.shape[0], jnp.bool_))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def aot_cost(cfg, params) -> dict:
    """Compiler cost model of one full train step on a v5e target."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:2x2",
        chips_per_host_bounds=(2, 2, 1), num_slices=1)
    # single-device program: use a 1-device mesh over the first chip
    mesh = Mesh(np.array(topo.devices)[:1], ("data",))
    rep = NamedSharding(mesh, P())

    optimizer = optax.adam(cfg.lr)
    opt_state_like = jax.eval_shape(optimizer.init, params)
    b = cfg.batch_size
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt, sharding=rep)
    arg_shapes = (
        jax.tree.map(lambda x: sds(x.shape, x.dtype), params),
        jax.tree.map(lambda x: sds(x.shape, x.dtype), opt_state_like),
        sds((b, 3), jnp.int32), sds((b, 3), jnp.int32),
        sds((b,), jnp.int32), sds((b,), jnp.int32), sds((b,), jnp.int32),
    )
    step = make_step(cfg, optimizer)
    compiled = jax.jit(step).lower(*arg_shapes).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return {"flops": float(ca.get("flops", -1)),
            "bytes": float(ca.get("bytes accessed", -1))}


def measure(cfg) -> dict:
    """Real-chip: control matmul rate at the step's precision + step time."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_gqe_xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from graphqembed_tpu.models.gqe import _precision

    prec = _precision(cfg)
    k = 2048

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def control(x, w, n):
        def body(c, _):
            c = jnp.dot(c, w, precision=prec,
                        preferred_element_type=jnp.float32)
            c = c / jnp.maximum(jnp.max(jnp.abs(c)), 1.0)
            return c, ()
        c, _ = jax.lax.scan(body, x, (), length=n)
        return c

    x = jax.random.normal(jax.random.key(0), (k, k), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (k, k), jnp.float32)
    n = 64
    jax.block_until_ready(control(x, w, n))

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        float(jnp.sum(out.ravel()[:1]))  # value-read fence (works for scalars)
        return time.perf_counter() - t0

    def theil_sen(run_fn, windows, reps=2):
        """Median-of-pairwise-slopes of time vs work (bench.py §7
        methodology): the intercept absorbs RTT/dispatch constants and the
        median rejects tunnel spikes that poison two-point differences."""
        for w_ in windows:                      # compile every window first
            jax.block_until_ready(run_fn(w_))
        points = []
        for _ in range(reps):
            for w_ in windows:
                points.append((w_, timed(lambda: run_fn(w_))))
        slopes = [(tj - ti) / (nj - ni)
                  for i, (ni, ti) in enumerate(points)
                  for nj, tj in points[i + 1:] if nj != ni]
        return float(np.median(slopes))

    per_mm = theil_sen(lambda m_: control(x, w, m_), (n, 3 * n, 5 * n))
    mxu_tflops = 2 * k**3 / per_mm / 1e12

    # step timing: the scan train step at bench shapes (same engine as
    # bench.py, short windows)
    import optax

    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.graph.synthetic import synthetic_graph
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training.device_data import (
        DeviceTrainData,
        make_scan_train_step,
    )

    graph = synthetic_graph(seed=0, scale=40.0, avg_degree=10.0)
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=30)
    data = DeviceTrainData(graph.schema, s.sample_many("3i", 1500))
    params = init_params(cfg, graph.schema, jax.random.key(0))
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    scan = make_scan_train_step(cfg, optimizer)
    key = jax.random.key(0)
    state = {"p": params, "o": opt_state}

    ctr = {"i": 0}

    def run(n_steps):
        ctr["i"] += 1
        p, o = state["p"], state["o"]
        p, o, loss = scan(p, o, data.pools["3i"], "3i",
                          jax.random.fold_in(key, ctr["i"]), n_steps, 1.0,
                          True)
        state["p"], state["o"] = p, o
        return loss

    jax.block_until_ready(run(100))
    step_s = theil_sen(run, (500, 2500, 4500))
    return {"mxu_tflops_at_step_precision": mxu_tflops,
            "step_ms": step_s * 1e3,
            "queries_per_sec": cfg.batch_size / step_s,
            "n_nodes": graph.schema.n_nodes}


def ablate(cfg) -> dict:
    """Itemize the scan step (r05, VERDICT r04 task 5): time four nested
    variants of the same T-step scan — batch SELECTION only, +forward loss,
    +backward grads, +Adam update — with difference timing (compile both
    window sizes first; the deltas attribute each phase). All variants keep
    their outputs live in the carry so XLA cannot DCE the measured work
    (the dense [N, d] table cotangent is reduced into a scalar accumulator,
    which adds one read pass — an accepted +~20 µs overestimate of bwd)."""
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.graph.synthetic import synthetic_graph
    from graphqembed_tpu.models import gqe
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training.device_data import (
        DeviceTrainData,
        _select_batches,
    )

    graph = synthetic_graph(seed=0, scale=40.0, avg_degree=10.0)
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=30)
    data = DeviceTrainData(graph.schema, s.sample_many("3i", 1500))
    pool = data.pools["3i"]
    params = init_params(cfg, graph.schema, jax.random.key(0))
    optimizer = optax.adam(cfg.lr)
    b = cfg.batch_size

    def select(key, n_steps):
        return _select_batches(
            cfg, key, n_steps,
            (pool.anchors, pool.rels, pool.inter_modes, pool.targets,
             pool.negs, pool.neg_counts, pool.hard, pool.hard_counts),
            True)[0]

    @functools.partial(jax.jit, static_argnames=("n_steps", "mode"),
                       donate_argnames=("params", "opt_state"))
    def run_mode(params, opt_state, key, n_steps, mode):
        xs = select(key, n_steps)

        def body(carry, batch):
            params, opt_state, acc = carry

            def loss_fn(p):
                return gqe.margin_loss_rows_onegather(
                    cfg, p, "3i", batch["anchors"], batch["rels"],
                    batch["inter_modes"], batch["targets"], batch["negs"],
                    jnp.ones(b, jnp.bool_))

            if mode == "sel":
                acc = acc + jnp.sum(batch["negs"]).astype(jnp.float32)
            elif mode == "fwd":
                acc = acc + loss_fn(params)
            elif mode == "fwdbwd":
                loss, grads = jax.value_and_grad(loss_fn)(params)
                acc = acc + loss + sum(
                    jnp.sum(g).astype(jnp.float32)
                    for g in jax.tree.leaves(grads))
            else:
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                acc = acc + loss
            return (params, opt_state, acc), ()

        (params, opt_state, acc), _ = jax.lax.scan(
            body, (params, opt_state, jnp.float32(0.0)), xs)
        return params, opt_state, acc

    def timed_mode(mode, n_base=400):
        state = (jax.tree.map(lambda x: x.copy(), params), None, 0)
        state = (state[0], optimizer.init(state[0]), jax.random.key(1))

        def go(state, n):
            p, o, k = state
            p, o, acc = run_mode(p, o, jax.random.fold_in(k, n), n, mode)
            jax.block_until_ready(acc)
            float(acc)
            return (p, o, k)

        state = go(state, n_base)
        state = go(state, 11 * n_base)
        t0 = time.perf_counter(); state = go(state, n_base)
        t1 = time.perf_counter(); state = go(state, 11 * n_base)
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (10 * n_base) * 1e6

    out = {}
    for mode in ("sel", "fwd", "fwdbwd", "full"):
        out[f"{mode}_us"] = round(timed_mode(mode), 1)
        print(f"ablate[{mode}]: {out[f'{mode}_us']} us/step", flush=True)
    out["bwd_delta_us"] = round(out["fwdbwd_us"] - out["fwd_us"], 1)
    out["adam_delta_us"] = round(out["full_us"] - out["fwdbwd_us"], 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-measure", action="store_true",
                    help="cost model only (no real chip needed)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 COMPUTE (f32 storage, optax Adam) — the "
                         "bench.py winning variant")
    args = ap.parse_args()

    overrides = {"compute_dtype": "bfloat16"} if args.bf16 else None
    graph, cfg, params = build(overrides)
    n = graph.schema.n_nodes
    cost = aot_cost(cfg, params)
    # Analytic MINIMUM HBM traffic for the dense-Adam step (the compiler's
    # "bytes accessed" counts every op's operands, over-counting values that
    # stay fused in VMEM — the truth lies between these brackets):
    #   Adam over all leaves: read(param, grad, mu, nu) + write(param, mu,
    #   nu) = 7 passes over every parameter byte; grad of the table is
    #   materialized dense (scatter of B·(A+2) rows into zeros[N, d]).
    d = cfg.embed_dim
    b = cfg.batch_size
    r, n_modes = graph.schema.n_relations, len(graph.schema.modes)
    param_bytes = 4 * (n * d + r * d * d + 2 * n_modes * d * d)
    gathers = 2 * 4 * b * 5 * d * 2      # (3 anchors+tgt+neg) rows, fwd+bwd
    select_mm = 2 * 4 * b * r * d * 2    # [B, R·d] intermediate, fwd+bwd
    analytic = 7 * param_bytes + gathers + select_mm
    cost["bytes_analytic_min"] = float(analytic)
    out = {"config": {"d": cfg.embed_dim, "batch": cfg.batch_size,
                      "structure": "3i", "projection": cfg.projection,
                      "n_nodes": n, "n_relations": graph.schema.n_relations,
                      "precision": ("bf16(DEFAULT)" if args.bf16
                                    else "fp32(HIGHEST)"),
                      "loss_path": "margin_loss_rows_onegather (r05)"},
           "compiler_cost_model": cost,
           "hbm_peak_gbs": HBM_PEAK_GBS,
           "bf16_peak_tflops": BF16_PEAK_TFLOPS}
    t_hbm_us = cost["bytes"] / (HBM_PEAK_GBS * 1e9) * 1e6
    t_hbm_min_us = cost["bytes_analytic_min"] / (HBM_PEAK_GBS * 1e9) * 1e6
    out["t_hbm_bound_us_compiler_model"] = round(t_hbm_us, 2)
    out["t_hbm_bound_us_analytic_min"] = round(t_hbm_min_us, 2)

    if not args.no_measure:
        m = measure(cfg)
        out["ablation_us"] = ablate(cfg)
        out["measured"] = {k: round(v, 3) for k, v in m.items()}
        t_mxu_us = cost["flops"] / (m["mxu_tflops_at_step_precision"]
                                    * 1e12) * 1e6
        out["t_mxu_bound_us"] = round(t_mxu_us, 2)
        # speed-of-light bracket: [max(mxu, analytic-min-hbm),
        #                          max(mxu, compiler-model-hbm)]
        sol_lo = max(t_mxu_us, t_hbm_min_us)
        sol_hi = max(t_mxu_us, t_hbm_us)
        out["speed_of_light_us"] = [round(sol_lo, 2), round(sol_hi, 2)]
        out["fraction_of_sol"] = [
            round(sol_lo / (m["step_ms"] * 1e3), 3),
            round(sol_hi / (m["step_ms"] * 1e3), 3)]

    art = Path(__file__).resolve().parents[1] / "docs" / "artifacts"
    art.mkdir(parents=True, exist_ok=True)
    name = "step_roofline_bf16.json" if args.bf16 else "step_roofline.json"
    (art / name).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    print(f"wrote {art / name}")


if __name__ == "__main__":
    main()
