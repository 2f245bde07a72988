"""Benchmark: every headline metric, driver-captured as JSON lines.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"} per metric —
the replacement for the reference's FPS title-bar counter
(Parellel/main.cu:79-85). Baseline target: 50 Mrays/s/chip (BASELINE.json
north star). Rays counted = every traced ray: primary + shadow + secondary
wavefront rays, as accumulated by the wavefront scan itself.

Default output (in order; the HEADLINE stays the LAST line for the driver):
  1. hit-heavy forward Mrays/s (camera (0,6,14): ~60% of pixels hit bob, so
     the number can't lean on cheap background lanes)
  2. backward/forward time ratio at the flagship config — headline framing
     AND the hit-heavy framing (where the remat residuals are ~4x larger)
  3. full train-step time (grad wrt verts+colors+materials+lights + adam +
     per-step device chunk re-sort — BASELINE config 4 at 1080p)
  4. branching DIELECTRIC wavefront Mrays/s (bob + glass sphere — the
     reference's flagship Fresnel-split semantics)
  5. streaming/resident frame-time ratio on bob x2 (HBM-streaming kernel
     overhead vs the VMEM-resident table, same scene)
  6. bob x4 (42.7k tris) — the GENUINE over-VMEM streaming configuration
  7. depth-10 forward Mrays/s (the reference's RECURSION_DEPTH)
  8. HEADLINE: forward Mrays/s, 1080p bob_tri.obj depth-3, reference framing

Every leg runs FAULT-ISOLATED (run_leg): a tunnel exception in one leg logs
a {"leg_failed": ...} line and continues; at process end the full captured
metric set is re-emitted so the artifact tail always carries every line, the
headline last; exit status is 0 iff the headline leg succeeded.

Measurement discipline (CLAUDE.md): the remote-TPU tunnel adds 10-20 ms per
dispatch, serves IDENTICAL executions from a cache, and intermittently stalls
for seconds-to-minutes. Every timing therefore runs N camera/param-jittered
iterations inside ONE jitted fori_loop with a fresh offset arg per call,
fenced by scalar float() reads, minus a 1-iteration call to cancel dispatch —
and every wall-clock is the MIN over >= `RT_BENCH_MIN_ATTEMPTS` attempts,
retried until the best two agree within 15% (a single stalled attempt can
never poison the result). All attempt spreads are logged to stderr.

Env knobs: RT_BENCH_WIDTH/HEIGHT/DEPTH/REPEATS, RT_BENCH_ACCEL
(chunked|bruteforce|pallas), RT_BENCH_CHUNK, RT_BENCH_SMOKE=1 for a tiny CPU
smoke run (headline only), RT_BENCH_HITHEAVY/GRAD/TRAIN/BRANCHING/STREAM/BIG/
DEPTH10=0 to skip a secondary metric, RT_BENCH_MIN_ATTEMPTS /
RT_BENCH_MAX_ATTEMPTS, RT_JAX_CACHE (persistent compilation cache dir;
default .jax_cache).
"""
from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_MRAYS = 50.0
MIN_ATTEMPTS = int(os.environ.get("RT_BENCH_MIN_ATTEMPTS", 4))
MAX_ATTEMPTS = int(os.environ.get("RT_BENCH_MAX_ATTEMPTS", 8))
AGREE_TOL = 0.15


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def attempts_min(call, tag: str, min_attempts: int = MIN_ATTEMPTS,
                 max_attempts: int = MAX_ATTEMPTS, tol: float = AGREE_TOL):
    """Min wall-clock over repeated fenced calls, with stall armor.

    Runs >= min_attempts; keeps attempting (up to max_attempts) until the two
    BEST attempts agree within `tol` — so the reported min was reproduced, not
    a fluke, and a multi-second tunnel stall in any attempt is discarded.
    Logs every attempt so a stall is visible in the captured stderr tail.
    """
    dts = []
    while True:
        t0 = time.perf_counter()
        call()
        dts.append(time.perf_counter() - t0)
        s = sorted(dts)
        settled = len(dts) >= min_attempts and s[1] <= s[0] * (1.0 + tol)
        if settled or len(dts) >= max_attempts:
            if not settled:
                _log(f"[bench:{tag}] WARNING: best two attempts disagree by "
                     f">{tol:.0%} after {len(dts)} tries — tunnel unstable")
            _log(f"[bench:{tag}] attempts (s): "
                 + ", ".join(f"{d:.3f}" for d in dts)
                 + f" -> min {s[0]:.3f}")
            return s[0]


class FrameBench:
    """The jittered-fori-loop frame timer for one (scene, cfg) pair.

    The loop re-renders with a sub-micron camera jitter per iteration AND a
    fresh `off` argument per call, so no two executions are identical (the
    tunnel cache) and per-frame host dispatch cost is amortized; `go()`
    fences with scalar float() reads (block_until_ready has been observed to
    return early through the tunnel).
    """

    def __init__(self, scene, cfg, branching: bool = False):
        from realtrace_tpu.render.pipeline import render_with_stats
        from jax import lax

        self.scene = scene
        self._seq = iter(range(1, 100000))

        @functools.partial(jax.jit, static_argnames=("n",))
        def frames(scene, camera, off, n: int):
            def body(i, carry):
                acc, nr = carry
                cam_i = camera.replace(
                    position=camera.position
                    + (off + i.astype(camera.position.dtype)) * 1e-6)
                img, nrays = render_with_stats(scene, cam_i, cfg,
                                               branching=branching)
                return acc + jnp.mean(img), nr + nrays
            return lax.fori_loop(0, n, body, (jnp.zeros(()), jnp.zeros(())))

        self._frames = frames

    def go(self, camera, n: int):
        acc, nr = self._frames(self.scene, camera,
                               jnp.float32(next(self._seq) * 100.0), n)
        return float(acc), float(nr)

    def measure(self, camera, tag: str, reps: int):
        """Steady-state (seconds/frame, rays/frame, checksum)."""
        t0 = time.perf_counter()
        self.go(camera, 1)
        _log(f"[bench:{tag}] compile+first frame: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        acc, nr = self.go(camera, reps + 1)
        _log(f"[bench:{tag}] compile timed size: {time.perf_counter() - t0:.1f}s")
        dt1 = attempts_min(lambda: self.go(camera, reps + 1), f"{tag}:loop")
        dt0 = attempts_min(lambda: self.go(camera, 1), f"{tag}:single",
                           min_attempts=2, max_attempts=6)
        dt = max((dt1 - dt0) / reps, 1e-9)
        nrays = nr / (reps + 1)
        _log(f"[bench:{tag}] steady frame: {dt*1e3:.1f} ms, "
             f"rays/frame: {nrays/1e6:.2f}M, checksum {acc:.5f}")
        return dt, nrays, acc


#: every record emitted this run, in order — re-emitted at process end so the
#: artifact TAIL always contains the full metric set even if a late leg died
#: mid-print (the round-4 failure mode: one tunnel exception aborted the
#: remaining legs AND truncated the earlier lines out of the captured tail)
_EMITTED: list[dict] = []


def emit(metric: str, value: float, unit: str, vs_baseline=None, **extra):
    rec = {"metric": metric, "value": round(value, 3), "unit": unit,
           "vs_baseline": (round(vs_baseline, 4)
                           if vs_baseline is not None else None)}
    rec.update(extra)
    _EMITTED.append(rec)
    print(json.dumps(rec), flush=True)


def run_leg(name: str, fn, attempts: int = 2) -> bool:
    """Run one bench leg fault-isolated: a tunnel flake in any leg must never
    abort the remaining legs or the final re-emit (round-4 postmortem —
    BENCH_r04 rc=1 lost the headline because the bigscene leg crashed).
    Default 2 attempts: the observed failures (remote_compile: response body
    closed) are transient tunnel errors — a retry usually lands."""
    import traceback
    for k in range(attempts):
        try:
            fn()
            return True
        except Exception as e:                          # noqa: BLE001
            _log(f"[bench:{name}] LEG FAILED (try {k + 1}/{attempts}):\n"
                 + traceback.format_exc())
            err = f"{type(e).__name__}: {e}"
    print(json.dumps({"leg_failed": name, "error": err[:300]}), flush=True)
    return False


def bench_grad_ratio(scene, camera, cfg, t_fwd: float, reps: int,
                     tag: str = "grad", framing: str = "bob") -> None:
    """backward/forward time ratio at the FLAGSHIP config (BASELINE metric 2).

    `backward` = value_and_grad of the pixel loss wrt (vertices, colors,
    lights) — the residual-caching rematerialized backward (cfg.remat);
    `forward` = the same framing's measured frame time (same program the
    grad's forward pass runs). Same fori-loop + attempts protocol. Called
    for BOTH the headline framing and the hit-heavy close framing (the remat
    residuals — the "sweep"-tagged query results — are ~4x larger there).
    """
    import jax.tree_util as jtu
    from jax import lax
    from realtrace_tpu.diff.inverse import render_loss, scene_params

    h, w = camera.height, camera.width
    target = jnp.zeros((h * w, 3), jnp.float32)
    params = scene_params(scene, ("tri_vertices", "tri_colors", "lights"))

    def grad_scalar(p, cam):
        loss, grads = jax.value_and_grad(
            lambda q: render_loss(q, scene, cam, cfg, target, False))(p)
        return loss + sum(jnp.sum(g) * 1e-12 for g in jtu.tree_leaves(grads))

    # camera is a TRACED argument: the headline and hit-heavy framings share
    # one executable (and one persistent-cache entry)
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(params, cam, off, n: int):
        def body(i, acc):
            p = jtu.tree_map(
                lambda x: x + (off + jnp.asarray(i, x.dtype)) * 1e-12, params)
            return acc + grad_scalar(p, cam)
        return lax.fori_loop(0, n, body, jnp.zeros(()))

    seq = iter(range(1, 100000))

    def go(n):
        return float(loop(params, camera, jnp.float32(next(seq)), n))

    t0 = time.perf_counter()
    go(1)
    _log(f"[bench:{tag}] compile+first: {time.perf_counter() - t0:.1f}s")
    go(reps + 1)
    dt1 = attempts_min(lambda: go(reps + 1), f"{tag}:loop")
    dt0 = attempts_min(lambda: go(1), f"{tag}:single",
                       min_attempts=2, max_attempts=6)
    t_bwd = max(dt1 - dt0, 1e-9) / reps
    _log(f"[bench:{tag}] fwd {t_fwd*1e3:.1f} ms, value_and_grad {t_bwd*1e3:.1f} ms")
    emit(f"backward/forward time ratio {camera.width}x{camera.height} "
         f"{framing} depth-{cfg.max_depth} ({cfg.accel})",
         t_bwd / t_fwd, "x", None,
         forward_ms=round(t_fwd * 1e3, 2), backward_ms=round(t_bwd * 1e3, 2))


def bench_train_step(scene, camera, cfg, reps: int) -> None:
    """FULL inverse-rendering train-step time at scale: value_and_grad of the
    pixel loss wrt (vertices, per-vertex colors, materials, lights) + adam
    update + the ON-DEVICE chunk re-sort every step (``resort=True`` — the
    accel ordering must track moving vertices; BASELINE config 4 semantics
    at 1080p instead of the 16x12 CPU test, tests/test_grad.py)."""
    import optax
    from jax import lax
    from realtrace_tpu.diff.inverse import render_loss, scene_params

    h, w = camera.height, camera.width
    target = jnp.zeros((h * w, 3), jnp.float32)
    fields = ("tri_vertices", "tri_colors", "tri_materials", "lights")
    params0 = scene_params(scene, fields)
    opt = optax.adam(1e-3)
    opt0 = opt.init(params0)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(params, opt_state, off, n: int):
        def body(i, carry):
            p, o, acc = carry
            p = {**p, "tri_vertices":
                 p["tri_vertices"] + (off + i.astype(jnp.float32)) * 1e-12}
            loss, grads = jax.value_and_grad(render_loss)(
                p, scene, camera, cfg, target, False, True)
            upd, o = opt.update(grads, o, p)
            p = optax.apply_updates(p, upd)
            return (p, o, acc + loss)
        _, _, acc = lax.fori_loop(0, n, body, (params, opt_state, jnp.zeros(())))
        return acc

    seq = iter(range(1, 100000))

    def go(n):
        return float(loop(params0, opt0, jnp.float32(next(seq)), n))

    t0 = time.perf_counter()
    go(1)
    _log(f"[bench:train] compile+first: {time.perf_counter() - t0:.1f}s")
    go(reps + 1)
    dt1 = attempts_min(lambda: go(reps + 1), "train:loop")
    dt0 = attempts_min(lambda: go(1), "train:single",
                       min_attempts=2, max_attempts=6)
    t_step = max(dt1 - dt0, 1e-9) / reps
    emit(f"train step (grad wrt verts+colors+materials+lights, adam, "
         f"device chunk re-sort) {w}x{h} bob depth-{cfg.max_depth}",
         t_step * 1e3, "ms/step", None)


def bench_bigscene(width: int, height: int, reps: int) -> None:
    """The GENUINE over-VMEM streaming configuration: bob x4 (42.7k tris,
    ~10.9MB constants table > RESIDENT_LIMIT) — the HBM-streaming kernel is
    selected by build_pack's own residency decision, nothing forced.
    Ref ambition: Parellel/main.cu:49 (num_max defaults to 10M triangles)."""
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.ops.pallas import trace as ptrace

    cfg = RenderConfig(max_depth=2, accel="pallas", chunk_size=64)
    scene, cam = scenes.duplicated_serial_scene(
        4, texture_path="/root/reference/Serial/bob_diffuse.png")
    scene = accel.with_chunks(scene, cfg)
    assert not ptrace.build_pack(scene, cfg).resident, \
        "expected bob x4 to exceed RESIDENT_LIMIT"
    camera = scenes.make_camera(cam, width, height, dtype=jnp.float32)
    dt, nrays, _ = FrameBench(scene, cfg).measure(camera, "bigscene", reps)
    mrays = nrays / dt / 1e6
    emit(f"forward Mrays/s/chip {width}x{height} bob_x4 42.7k tris "
         f"depth-2 (genuine HBM streaming)", mrays, "Mrays/s",
         mrays / BASELINE_MRAYS, frame_ms=round(dt * 1e3, 2))


def bench_stream_ratio(width: int, height: int, reps: int) -> None:
    """streaming/resident frame-time ratio on bob x2 (21k tris, table under
    the VMEM limit so BOTH variants run on the same scene; target <= 1.5)."""
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.ops.pallas import trace as ptrace

    cfg = RenderConfig(max_depth=2, accel="pallas", chunk_size=64)
    scene, cam = scenes.duplicated_serial_scene(
        2, texture_path="/root/reference/Serial/bob_diffuse.png")
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, width, height, dtype=jnp.float32)

    dt_res, nrays, _ = FrameBench(scene, cfg).measure(camera, "stream:resident", reps)
    saved = ptrace.RESIDENT_LIMIT
    ptrace.RESIDENT_LIMIT = 0            # force the HBM-streaming kernel
    try:
        dt_str, _, _ = FrameBench(scene, cfg).measure(camera, "stream:forced", reps)
    finally:
        ptrace.RESIDENT_LIMIT = saved
    emit("streaming/resident frame-time ratio bob_x2 21k tris "
         f"{width}x{height} depth-2", dt_str / dt_res, "x (target <= 1.5)",
         None, resident_mrays=round(nrays / dt_res / 1e6, 2),
         streaming_mrays=round(nrays / dt_str / 1e6, 2))


def bench_branching(width: int, height: int, depth: int, reps: int) -> None:
    """The branching DIELECTRIC wavefront (tile-granular compacted
    reflect-and-refract children): bob + a glass sphere, the scene class that
    exercises the reference's flagship semantics (Serial/world.cpp:77-100,
    Parellel/kernel.cu:190-256)."""
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel

    cfg = RenderConfig(max_depth=depth, accel="pallas", chunk_size=32)
    scene, cam = scenes.glass_bob_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png")
    assert scene.has_dielectrics()
    scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, width, height, dtype=jnp.float32)
    fb = FrameBench(scene, cfg, branching=True)
    dt, nrays, _ = fb.measure(camera, "branching", reps)
    mrays = nrays / dt / 1e6
    emit(f"forward Mrays/s/chip {width}x{height} bob + glass sphere "
         f"depth-{depth} (branching dielectric wavefront)",
         mrays, "Mrays/s", mrays / BASELINE_MRAYS,
         frame_ms=round(dt * 1e3, 2))


def main() -> None:
    smoke = os.environ.get("RT_BENCH_SMOKE") == "1"
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: repeat captures skip the ~100s tunnel
    # compiles (the grad leg alone compiled 103.9s in the round-3 capture)
    cache_dir = os.environ.get("RT_JAX_CACHE", "/root/repo/.jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception as e:                      # cache is best-effort
        _log(f"[bench] compilation cache unavailable: {e}")
    width = int(os.environ.get("RT_BENCH_WIDTH", 64 if smoke else 1920))
    height = int(os.environ.get("RT_BENCH_HEIGHT", 48 if smoke else 1080))
    depth = int(os.environ.get("RT_BENCH_DEPTH", 3))
    repeats = int(os.environ.get("RT_BENCH_REPEATS", 1 if smoke else 10))
    # RT_BENCH_ALL=1: run the secondary metrics even in smoke mode (CI
    # coverage of the grad/stream bench paths on CPU)
    skip_secondary = smoke and os.environ.get("RT_BENCH_ALL") != "1"
    accel_mode = os.environ.get("RT_BENCH_ACCEL", "pallas")

    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel

    cfg = RenderConfig(max_depth=depth, accel=accel_mode,
                       chunk_size=int(os.environ.get("RT_BENCH_CHUNK", 32)),
                       ray_block=int(os.environ.get("RT_BENCH_BLOCK", 8192)),
                       exact_mask_rays=int(os.environ.get("RT_BENCH_EXACT_MASK", 1 << 19)),
                       exact_mask_secondary=os.environ.get("RT_BENCH_EXACT_SECONDARY", "0") == "1")
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    if accel_mode != "bruteforce":
        scene = accel.with_chunks(scene, cfg)
    camera = scenes.make_camera(cam, width, height, dtype=jnp.float32)

    fb = FrameBench(scene, cfg)
    secondary_reps = max(2, repeats // 3)
    hl: dict = {}        # headline leg results, shared with the grad legs
    headline = (f"forward Mrays/s/chip {width}x{height} bob_tri.obj "
                f"depth-{depth} ({accel_mode})")

    # -- headline first (most protected from tunnel trouble), emitted
    # immediately so the capture always has it — and RE-emitted at the end so
    # it is also the LAST JSON line (what the driver parses). Every leg runs
    # fault-isolated via run_leg: one tunnel flake can no longer abort the
    # rest of the capture (the round-4 failure mode).
    def leg_headline():
        dt, nrays, _ = fb.measure(camera, "headline", repeats)
        hl["dt"], hl["mrays"] = dt, nrays / dt / 1e6
        emit(headline, hl["mrays"], "Mrays/s", hl["mrays"] / BASELINE_MRAYS)

    headline_ok = run_leg("headline", leg_headline, attempts=2)

    def leg_hitheavy():
        # same compiled program as the headline (camera is a traced arg):
        # zero extra compiles, just slower frames
        cam_close = dict(cam, position=(0.0, 6.0, 14.0))
        hl["camera_close"] = scenes.make_camera(cam_close, width, height,
                                                dtype=jnp.float32)
        dt_hh, nrays_hh, _ = fb.measure(hl["camera_close"], "hit-heavy", repeats)
        hl["dt_hh"] = dt_hh
        mrays_hh = nrays_hh / dt_hh / 1e6
        emit(f"forward Mrays/s/chip {width}x{height} bob close-framed "
             f"(~60% hit) depth-{depth} ({accel_mode})",
             mrays_hh, "Mrays/s", mrays_hh / BASELINE_MRAYS)

    if os.environ.get("RT_BENCH_HITHEAVY", "1") == "1" and not skip_secondary:
        run_leg("hit-heavy", leg_hitheavy)

    if os.environ.get("RT_BENCH_GRAD", "1") == "1" and not skip_secondary:
        if "dt" in hl:
            run_leg("grad", lambda: bench_grad_ratio(
                scene, camera, cfg, hl["dt"], secondary_reps))
        if "dt_hh" in hl:
            # the backward where it hurts: the close framing's residuals
            # ("sweep"-tagged query results) are ~4x the headline's
            run_leg("grad-hh", lambda: bench_grad_ratio(
                scene, hl["camera_close"], cfg, hl["dt_hh"], secondary_reps,
                tag="grad-hh", framing="bob close-framed (~60% hit)"))

    if os.environ.get("RT_BENCH_TRAIN", "1") == "1" and not skip_secondary:
        run_leg("train", lambda: bench_train_step(
            scene, camera, cfg, secondary_reps))

    if os.environ.get("RT_BENCH_BRANCHING", "1") == "1" and not skip_secondary:
        run_leg("branching", lambda: bench_branching(
            width, height, depth, secondary_reps))

    if os.environ.get("RT_BENCH_STREAM", "1") == "1" and not skip_secondary:
        run_leg("stream", lambda: bench_stream_ratio(
            width, height, secondary_reps))

    if os.environ.get("RT_BENCH_BIG", "1") == "1" and not skip_secondary:
        run_leg("bigscene", lambda: bench_bigscene(
            width, height, secondary_reps))

    def leg_depth10():
        # the reference's RECURSION_DEPTH (Serial/world.h:11): one capture of
        # the generalized wavefront + compaction ladder at depth 10
        cfg10 = dataclasses.replace(cfg, max_depth=10)
        fb10 = FrameBench(scene, cfg10)
        dt10, nrays10, _ = fb10.measure(camera, "depth10", secondary_reps)
        mrays10 = nrays10 / dt10 / 1e6
        emit(f"forward Mrays/s/chip {width}x{height} bob_tri.obj depth-10 "
             f"({accel_mode})", mrays10, "Mrays/s", mrays10 / BASELINE_MRAYS,
             frame_ms=round(dt10 * 1e3, 2))

    if os.environ.get("RT_BENCH_DEPTH10", "1") == "1" and not skip_secondary \
            and depth != 10:
        run_leg("depth10", leg_depth10)

    # -- final re-emit: the artifact tail must contain EVERY metric captured
    # this run, headline LAST (the driver parses the last JSON line) --------
    _log(f"[bench] re-emitting all {len(_EMITTED)} captured metrics")
    tail = [r for r in list(_EMITTED) if r["metric"] != headline]
    head = [r for r in list(_EMITTED) if r["metric"] == headline][:1]
    for rec in tail + head:
        print(json.dumps(rec), flush=True)
    sys.exit(0 if headline_ok else 1)


if __name__ == "__main__":
    main()
