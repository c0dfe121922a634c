"""Map compiled-HLO fusions of the benchmark train step back to source.

The profiler trace (tools/trace_report.py) names XLA ops like `fusion.345`
with no source attribution, so the ~4-5 ms of residual (non-Pallas) step
time was un-itemizable. This tool compiles the SAME train step as bench.py
(same spec/shapes, warm persistent cache) and prints, for every fusion /
standalone op, its root shape and the source_file:source_line histogram of
its instructions — cross-reference the names against the trace to find what
each hot fusion actually computes.

Usage: python tools/hlo_report.py [--gaussians N] [--scan-chunk K]
       [--match fusion.345 fusion.388 ...]   # only print these
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import collections
import re
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=100_000)
    ap.add_argument("--backend", default="pallas_rsort")
    ap.add_argument("--scan-chunk", type=int, default=30)
    ap.add_argument("--t-chunk", type=int, default=64)
    ap.add_argument("--gate-bins", type=int, default=8)
    ap.add_argument("--bwd-bf16", action="store_true", default=True)
    ap.add_argument("--w-max", type=int, default=None,
                    help="skip cap tuning (with --max-groups): ~5 min of "
                         "probe compiles saved when iterating")
    ap.add_argument("--max-groups", type=int, default=None)
    ap.add_argument("--match", nargs="*", default=None)
    ap.add_argument("--min-lines", type=int, default=1)
    ap.add_argument("--out", default=None,
                    help="also write the full HLO text here")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses as dc

    import jax.numpy as jnp
    import numpy as np

    from nlos_gaussian_renderer_tpu.configs.default import OptimizationParams
    from nlos_gaussian_renderer_tpu.data.synthetic import (
        make_ground_truth_scene,
        make_scan_grid,
    )
    from nlos_gaussian_renderer_tpu.ops import math as gmath
    from nlos_gaussian_renderer_tpu.ops.fused import TileSpec
    from nlos_gaussian_renderer_tpu.ops.fused_rsort import (
        RSortSpec,
        tune_rsort_spec,
    )
    from nlos_gaussian_renderer_tpu.ops.render import RenderSettings
    from nlos_gaussian_renderer_tpu.train import (
        create_train_state,
        make_optimizer,
        make_scanned_train_step,
    )

    rng = np.random.default_rng(0)
    volume_position = np.array([0.0, 1.0, 0.0], dtype=np.float32)
    volume_size = 0.6
    c, delta_t = 1.0, 0.0052
    scene = make_ground_truth_scene(
        rng, args.gaussians, volume_position, volume_size
    )
    scene = dc.replace(
        scene,
        log_scales=jnp.asarray(
            rng.uniform(np.log(0.002), np.log(0.012), (args.gaussians, 3)),
            jnp.float32,
        ),
    )
    box = gmath.volume_box_points(jnp.asarray(volume_position), volume_size)
    base = RSortSpec(
        t_chunk=args.t_chunk, gate_bins=args.gate_bins,
        bwd_p_bf16=args.bwd_bf16,
    )
    probe_cams = np.stack(
        [[-0.4, 0, -0.4], [0, 0, 0], [0.4, 0, 0.4]]
    ).astype(np.float32)
    if args.w_max is not None and args.max_groups is not None:
        spec = base._replace(w_max=args.w_max, max_groups=args.max_groups)
    else:
        spec = tune_rsort_spec(
            scene, probe_cams, box, 32, 100, 300, c, delta_t, base=base
        )
    settings = RenderSettings(
        num_sampling_points=32, start=100, end=300, backend=args.backend,
        tile_spec=TileSpec(t_theta=8, t_phi=16, t_r=64),
        rsort_spec=spec,
    )
    optim = OptimizationParams()
    tx = make_optimizer(optim)
    state = create_train_state(scene, tx)
    k = args.scan_chunk
    step_k = make_scanned_train_step(settings, optim, tx, max_sh_degree=0)

    cam_grid = jnp.asarray(make_scan_grid(256, 256).T)
    num_r = settings.num_bins
    cams = cam_grid[np.zeros((k, 1), np.int64)]
    targets = jnp.zeros((k, 1, num_r), jnp.float32)
    vol = jnp.asarray(volume_position)

    log("lowering + compiling (warm cache expected) ...")
    compiled = (
        jax.jit(step_k.__wrapped__ if hasattr(step_k, "__wrapped__")
                else step_k,
                donate_argnums=(0,))
        .lower(state, cams, targets, box, c, delta_t, vol)
        .compile()
    )
    txt = compiled.as_text()
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)
        log(f"wrote {args.out} ({len(txt)/1e6:.1f} MB)")

    # Parse: computation blocks, and per-instruction source metadata.
    comp_re = re.compile(r"^%?([\w\.\-]+) (?:\([^)]*\) -> .*|{)")
    meta_re = re.compile(
        r'source_file="([^"]+)" source_line=(\d+)'
    )
    opname_re = re.compile(r'op_name="([^"]+)"')
    fusion_call_re = re.compile(
        r"%?(fusion[\w\.\-]*) = (\S+) fusion\(.*calls=%?([\w\.\-]+)"
    )
    root_re = re.compile(r"ROOT ")

    # computation name -> list of (source_file, line, op_name)
    comps: dict[str, list] = collections.defaultdict(list)
    cur = None
    fusion_info = []  # (fusion_name, shape, called_comp)
    for line in txt.splitlines():
        ls = line.strip()
        if ls.endswith("{") and ("(" in ls or ls.startswith("%")):
            m = re.match(r"^(?:ENTRY )?%?([\w\.\-]+)", ls)
            cur = m.group(1) if m else None
            continue
        if ls == "}":
            cur = None
            continue
        fm = fusion_call_re.search(ls)
        if fm:
            fusion_info.append((fm.group(1), fm.group(2), fm.group(3)))
        if cur is None:
            continue
        mm = meta_re.search(ls)
        if mm:
            op = opname_re.search(ls)
            comps[cur].append(
                (mm.group(1), int(mm.group(2)),
                 op.group(1) if op else "")
            )

    want = set(args.match) if args.match else None
    print(f"{len(fusion_info)} fusions in compiled module")
    for name, shape, comp in fusion_info:
        if want and name not in want:
            continue
        insts = comps.get(comp, [])
        hist = collections.Counter(
            f"{f.split('/')[-1]}:{l}" for f, l, _ in insts
        )
        if not want and len(hist) < args.min_lines:
            continue
        print(f"\n== {name}  {shape}  ({len(insts)} attributed insts)")
        for src, n in hist.most_common(12):
            print(f"   {n:4d}  {src}")


if __name__ == "__main__":
    main()
