"""Throwaway: per-op trace diff of reorder_secondary on/off."""
from __future__ import annotations

import collections
import dataclasses
import glob
import gzip
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def top_ops(trace_dir):
    p = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(p))
    names = {e['pid']: e['args'].get('name', '') for e in d['traceEvents']
             if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    agg = collections.defaultdict(float)
    for e in d['traceEvents']:
        if e.get('ph') == 'X' and 'TPU' in names.get(e['pid'], ''):
            agg[e['name']] += e.get('dur', 0)
    return agg


def main():
    from realtrace_tpu.apps import scenes
    from realtrace_tpu.core.types import RenderConfig
    from realtrace_tpu.ops import accel
    from realtrace_tpu.render.pipeline import render_with_stats

    base = RenderConfig(max_depth=3, accel="pallas", chunk_size=64)
    scene, cam = scenes.serial_obj_scene(
        texture_path="/root/reference/Serial/bob_diffuse.png", dtype=jnp.float32)
    scene = accel.with_chunks(scene, base)
    camera = scenes.make_camera(cam, 1920, 1080, dtype=jnp.float32)

    aggs = {}
    for reorder in (True, False):
        cfg = dataclasses.replace(base, reorder_secondary=reorder)
        f = jax.jit(lambda s, c: render_with_stats(s, c, cfg, branching=False))
        img, n = f(scene, camera)
        jax.block_until_ready(img)
        tdir = f"/tmp/rtprof_reorder{int(reorder)}"
        shutil.rmtree(tdir, ignore_errors=True)
        jax.profiler.start_trace(tdir)
        for _ in range(3):
            img, n = f(scene, camera)
        jax.block_until_ready(img)
        jax.profiler.stop_trace()
        aggs[reorder] = top_ops(tdir)

    for reorder, agg in aggs.items():
        print(f"\n=== reorder={int(reorder)}: top ops (ms/frame) ===")
        for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:18]:
            print(f"{dur/3e3:9.3f}  {name[:100]}")


if __name__ == "__main__":
    main()
