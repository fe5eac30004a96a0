"""Benchmark: full SIMP iterations/sec on a 128^3 voxel cantilever.

Driver contract: prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured against the BASELINE.json target of >= 5 full SIMP
iterations/sec at 128^3 (matrix-free multigrid-CG).  All diagnostics go to
stderr.

Runs the measurement in a CHILD process (first with the fused Pallas matvec,
then — if the child dies, e.g. on a TPU kernel fault, which wedges the device
for the whole process — retried without it in a fresh process).

Env knobs (defaults = the round-4 measured-best single-chip config):
  BENCH_NELS / BENCH_DTYPE / BENCH_ITERS   problem size / dtype / window
  BENCH_MG_DTYPE      V-cycle interior dtype (default bfloat16)
  BENCH_MG_SMOOTH     per-level Chebyshev degrees (default "(1, 2)")
  BENCH_STENCIL_DTYPE Galerkin coefficient storage override (default "")
  BENCH_RECYCLE_K     subspace-recycled CG ring size (default 8; 0 = off)
  BENCH_FORCING       "adaptive" (default) inexact-SIMP rtol schedule
                      (params.cg_forcing semantics) | "fixed"
  BENCH_REFRESH_ITERS power-refresh depth per iteration (default 2)
  BENCH_GALERKIN / BENCH_MG_CYCLE / BENCH_SETUP_EVERY   MG structure
  BENCH_LATE_START / BENCH_SKIP_LATE   late-window placement
  BENCH_SHARDED=N     emit the N-device GSPMD collective evidence instead
  BENCH_BUDGET_S / BENCH_CKPT          retry budget / checkpoint path
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

_CACHE_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")


def _enable_compilation_cache():
    """Point JAX's persistent compile cache at a stable local dir.

    Must be the EXPLICIT config update: in this jaxlib the
    JAX_COMPILATION_CACHE_DIR env var is read by nothing (verified — the
    config default ignores the environment), so env-only setups silently
    recompile ~9 minutes per process through the TPU tunnel.  With the
    explicit update the cache key is stable across processes (measured:
    identical entry filename, 0.19s hit vs 0.69s cold on a probe program).
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _time_ms(fn, *args, reps=10):
    """Median-free mean wall time of a compiled callable, in ms."""
    import time as _t

    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = _t.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (_t.time() - t0) / reps * 1e3


def _phase_breakdown(vs, design, u, pvecs):
    """Per-phase ms timings of the SIMP iteration's components (stderr)."""
    import jax
    import jax.numpy as jnp

    from easysimp_tpu.ops.oc import oc_update

    op, filt = vs.op, vs.filt
    f_ext, free_mask, vsens = vs.step_args
    phys = filt.density_filter(design) if vs.use_density_filter else design
    scale = jax.jit(op.youngs_modulus)(phys)
    rows = []
    rows.append(("matvec (K@u)", _time_ms(
        jax.jit(op.apply_K), u, scale, reps=20)))
    rows.append(("element energies", _time_ms(
        jax.jit(op.element_energies_unit), u)))
    sens = jax.jit(op.compliance_sensitivities)(u, phys)
    if vs.use_density_filter:
        rows.append(("filter chain rule", _time_ms(
            jax.jit(filt.chain_rule), sens)))
    else:
        rows.append(("sensitivity filter", _time_ms(
            jax.jit(filt.sensitivity_filter), design, sens)))
    vf = 0.3

    def oc_only(d, s):
        return oc_update(d, s, vsens, vf, vs.total_volume, vs.elem_vol,
                         0.2, 0.5, volume_weights=vsens * vs.total_volume)

    rows.append(("OC bisection", _time_ms(jax.jit(oc_only), design, sens,
                                          reps=5)))
    rows.append(("full solve (CG)", _time_ms(
        jax.jit(vs.solve), design, pvecs, *vs.step_args, reps=2)))
    rows.append(("step: solve part", _time_ms(
        jax.jit(vs.step_solve), design, u, pvecs, f_ext, free_mask, reps=5)))
    rows.append(("step: update part", _time_ms(
        jax.jit(vs.step_update), design, phys, u, vsens, reps=5)))
    log("--- phase breakdown (ms) ---")
    for name, ms in rows:
        log(f"  {name:>20s}: {ms:8.2f}")


def run_sharded_evidence(n_devices: int):
    """Sharded-mode child: lower + execute the SIMP step over an n-device
    virtual CPU mesh and record the collective counts per step from the
    compiled HLO (the multi-chip program evidence — the 5 it/s target is
    defined on a v5p-8, which this single-chip host cannot measure, so the
    recorded artifact is the sharded program itself: same math, N-device
    shapes, XLA-inserted halo exchanges + reduction collectives)."""
    import jax

    jax.config.update("jax_platforms", "cpu")  # env var is ignored (site hook)

    import easysimp_tpu as et
    from easysimp_tpu.opt.optimize import build_voxel_step
    from easysimp_tpu.parallel.sharding import best_mesh_shape, make_mesh
    from easysimp_tpu.utils.terminal import set_quiet

    set_quiet(True)
    nels = tuple(int(v) for v in
                 os.environ.get("BENCH_NELS", "64,64,64").split(","))
    devices = jax.devices()
    if len(devices) < n_devices:
        log(f"only {len(devices)} virtual devices (set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n_devices}); skipping")
        sys.exit(1)
    nx, ny, nz = nels
    grid = et.generate_grid(nels, (0.0, 0.0, 0.0),
                            tuple(float(n) for n in nels))
    bc = et.apply_fixed_boundary(
        grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
    load = et.PointLoad(
        et.select_nodes_by_box(grid, [nx, 0, 0], [nx, 0, nz]),
        [0.0, -1.0, 0.0])
    params = et.OptimizationParameters(
        E0=1.0, Emin=1e-9, nu=0.3, p=3.0, volume_fraction=0.3,
        filter_radius=1.5, dtype="float32", cg_rtol=1e-5, cg_maxiter=100,
        preconditioner="multigrid")
    shape = best_mesh_shape(n_devices, nels)
    mesh = make_mesh(n_devices, shape=shape, devices=devices[:n_devices])
    vs = build_voxel_step(grid, [load], [bc], params, mesh=mesh)
    lowered = jax.jit(vs.step).lower(
        vs.design0, vs.u0, vs.pvecs0, *vs.step_args)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    n_permute = hlo.count("collective-permute")
    n_allreduce = hlo.count("all-reduce")
    t0 = time.time()
    outs = compiled(vs.design0, vs.u0, vs.pvecs0, *vs.step_args)
    jax.block_until_ready(outs)
    log(f"sharded step OK: mesh={shape} grid={nels} "
        f"energy={float(outs[3]):.6e} cg={int(outs[6])} "
        f"exec {time.time() - t0:.2f}s")
    log(f"collectives/step in compiled HLO: "
        f"{n_permute} collective-permute (halo exchanges), "
        f"{n_allreduce} all-reduce (CG/volume reductions)")
    print(json.dumps({
        "metric": f"sharded_step_collectives_{n_devices}dev_"
                  f"{nx}x{ny}x{nz}",
        "value": n_permute + n_allreduce,
        "unit": "collectives/step",
        "vs_baseline": 1.0 if (n_permute > 0 and n_allreduce > 0) else 0.0,
    }), flush=True)


def _load_ckpt(path, design0):
    """Load a mid-measurement checkpoint if present and shape-compatible."""
    if not path or not os.path.exists(path):
        return None
    try:
        ck = dict(np.load(path, allow_pickle=False))
    except Exception as e:  # noqa: BLE001 — a bad ckpt must not kill the run
        log(f"ignoring unreadable checkpoint {path}: {e}")
        return None
    if tuple(ck["design"].shape) != tuple(design0.shape):
        log("ignoring checkpoint with mismatched grid shape")
        return None
    return ck


def _save_ckpt(path, design, u, pvecs, done_iters, early_t, late_t, cgs):
    """Atomic device->host checkpoint of the measurement state.

    The tunnel TPU currently faults heavy programs at arbitrary points
    (round-3: mid-timed-loop, after 2+ clean executions — ~35-50 min of
    retries lost per attempt without this).  Holds the trajectory arrays
    AND the per-iteration timing samples collected so far, so every
    completed iteration contributes to the final figure no matter how
    many child processes the faults consume."""
    if not path:
        return
    arrs = {"design": np.asarray(design), "u": np.asarray(u),
            "done_iters": np.int64(done_iters),
            "n_pvecs": np.int64(len(pvecs)),
            "early_t": np.asarray(early_t, dtype=np.float64),
            "late_t": np.asarray(late_t, dtype=np.float64),
            "cgs": np.asarray(cgs, dtype=np.int64)}
    for i, v in enumerate(pvecs):
        arrs[f"pvec{i}"] = np.asarray(v)
    tmp = path + ".tmp.npz"   # explicit .npz: savez appends it otherwise
    np.savez(tmp, **arrs)
    os.replace(tmp, path)


def run_measurement():
    """Child-process entry: one full measurement, JSON on stdout."""
    nels = tuple(int(v) for v in
                 os.environ.get("BENCH_NELS", "128,128,128").split(","))
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    n_timed = int(os.environ.get("BENCH_ITERS", "10"))
    use_pallas = os.environ.get("BENCH_USE_PALLAS", "1") == "1"
    with_phases = os.environ.get("BENCH_PHASES", "0") == "1"
    # bfloat16 V-cycle interior by default: with the Galerkin stencil cycle
    # the V-cycle is FIELD-traffic-bound (restrict/prolong/Chebyshev vector
    # passes + stencil reads), and halving that traffic measured 25 ->
    # 12.9 ms per CG iteration at 128^3 iter-60 contrast for only +2 CG
    # iterations (phase matrix, round 3).  [The round-2 "bf16 not worth it"
    # verdict applied to the COMPUTE-bound element-kernel cycle.]  CG
    # itself stays fp32 and solves to the same rtol.
    mg_dtype = os.environ.get("BENCH_MG_DTYPE", "bfloat16")
    ckpt_path = os.environ.get("BENCH_CKPT", "")

    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_PLATFORM"):
        # Local validation of the bench flow itself (the JAX_PLATFORMS env
        # var is ignored by the site hook — must be the config update).
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    _enable_compilation_cache()
    log(f"devices: {jax.devices()}")

    import easysimp_tpu as et
    from easysimp_tpu.opt.optimize import build_voxel_step
    from easysimp_tpu.utils.terminal import set_quiet

    set_quiet(True)  # keep stdout JSON-only

    nx, ny, nz = nels
    grid = et.generate_grid(nels, (0.0, 0.0, 0.0),
                            tuple(float(n) for n in nels))
    bc = et.apply_fixed_boundary(
        grid, et.select_nodes_by_plane(grid, [0, 0, 0], [1, 0, 0], 1e-6))
    load = et.PointLoad(
        et.select_nodes_by_box(grid, [nx, 0, 0], [nx, 0, nz]),
        [0.0, -1.0, 0.0])
    import ast

    params = et.OptimizationParameters(
        E0=1.0, Emin=1e-9, nu=0.3, p=3.0, volume_fraction=0.3,
        filter_radius=1.5, dtype=dtype, cg_rtol=1e-5, cg_maxiter=500,
        preconditioner="multigrid", use_pallas_matvec=use_pallas,
        mg_cycle_dtype=mg_dtype,
        mg_stencil_dtype=os.environ.get("BENCH_STENCIL_DTYPE", ""),
        mg_refresh_iters=int(os.environ.get("BENCH_REFRESH_ITERS", "2")),
        mg_galerkin=os.environ.get("BENCH_GALERKIN", "1") == "1",
        mg_cycle=os.environ.get("BENCH_MG_CYCLE", "v"),
        mg_smooth_iters=ast.literal_eval(
            os.environ.get("BENCH_MG_SMOOTH", "(1, 2)")))
    log(f"grid {nels} = {grid.n_cells} cells, {grid.n_dofs} dofs, "
        f"dtype {dtype}, pallas {use_pallas}")

    t0 = time.time()
    vs = build_voxel_step(grid, [load], [bc], params)
    # Two programs per iteration, matching the driver (the one-program
    # solve+sens+OC composition faults the TPU next to the Pallas kernels;
    # see VoxelStep docstring).
    # No donation: buffer aliasing is an UNVALIDATED configuration next to
    # the Pallas kernels (the validated step_split isolation run used plain
    # jit), and XLA reuses the freed buffers anyway at these sizes.
    solve_part = jax.jit(vs.step_solve)
    update_part = jax.jit(vs.step_update)
    # THREE-program iteration (precond-setup | MG-CG | update) when the
    # builder provides the finer split: the Galerkin stencil build + power
    # refresh + coarsest factorization compiled into the SAME program as
    # the Pallas MG-CG solve faults the tunnel TPU on essentially every
    # first execution (round-3; the per-class isolation runs gal_build /
    # gal_vcycle each pass solo — program-complexity-dependent faults,
    # memory/tpu-env-gotchas.md).  BENCH_SPLIT3=0 forces the two-program
    # form for A/B.
    use_split3 = (os.environ.get("BENCH_SPLIT3", "1") == "1"
                  and getattr(vs, "step_precond", None) is not None)
    setup_every = int(os.environ.get("BENCH_SETUP_EVERY", "1"))
    mg_state = None
    steps_since_setup = 0
    cg_baseline = None
    last_cg = None
    if use_split3:
        pre_part = jax.jit(vs.step_precond)
        cg_part = jax.jit(vs.step_cg)
        log(f"using three-program step split (precond | cg | update), "
            f"setup_every={setup_every}")
    f_ext, free_mask, vsens = vs.step_args
    design, u, pvecs = vs.design0, vs.u0, vs.pvecs0
    ck = _load_ckpt(ckpt_path, design)
    early_t, late_t, cgs = [], [], []
    if ck is not None:
        # Resume a measurement a previous child carried partway before the
        # TPU faulted: trajectory state + per-iteration timing samples.
        design = jnp.asarray(np.asarray(ck["design"]), design.dtype)
        u = jnp.asarray(np.asarray(ck["u"]), design.dtype)
        saved = tuple(jnp.asarray(np.asarray(ck[f"pvec{i}"]), design.dtype)
                      for i in range(int(ck["n_pvecs"])))
        if len(saved) == len(pvecs) and \
                all(s.shape == p.shape for s, p in zip(saved, pvecs)):
            pvecs = saved
        else:
            # Hierarchy depth changed between children (e.g. a different
            # EASYSIMP_MAX_COARSE_DOFS): keep the trajectory state, cold
            # re-init the power vectors.
            log(f"checkpoint pvecs ({len(saved)} levels) do not match the "
                f"current hierarchy ({len(pvecs)}); re-initializing")
            if vs.power_init is not None:
                if getattr(vs, "power_init_split", None) is not None:
                    pvecs = vs.power_init_split(design, vs.step_args[1])
                else:
                    pvecs = jax.jit(vs.power_init)(design, vs.step_args[1])
        done_iters = int(ck["done_iters"])
        for key, dst in (("early_t", early_t), ("late_t", late_t),
                         ("cgs", cgs)):
            if key in ck:   # absent in pre-sample-format checkpoints
                dst.extend(np.asarray(ck[key]).tolist())
        log(f"resumed measurement from checkpoint at iter {done_iters} "
            f"({len(early_t)} early + {len(late_t)} late samples)")
    else:
        done_iters = 0
        if vs.power_init is not None:
            # Per-level programs, not the all-levels one-shot: the one-shot
            # is the most fault-prone program class on the tunnel TPU
            # (round-2/3 flake data in memory/tpu-env-gotchas.md).
            if getattr(vs, "power_init_split", None) is not None:
                pvecs = vs.power_init_split(design, vs.step_args[1])
            else:
                pvecs = jax.jit(vs.power_init)(design, vs.step_args[1])
            jax.block_until_ready(pvecs)  # drain before the next program

    first_exec = True
    # Subspace-recycled CG (BENCH_RECYCLE_K>1): ring buffer of recent
    # solutions whose deltas deflate the warm-start residual (ops/cg.py).
    recycle_k = int(os.environ.get("BENCH_RECYCLE_K", "8"))
    rhist = None
    push_jit = None
    if recycle_k > 1:
        from easysimp_tpu.ops.cg import recycle_init, recycle_push
        rhist = recycle_init(recycle_k, u)
        push_jit = jax.jit(recycle_push)
        log(f"subspace recycling enabled: k={recycle_k}")
    # Adaptive CG forcing (inexact SIMP): same schedule as the driver
    # (opt/optimize.py) — rtol_i = clip(coeff * change_{i-1}, cg_rtol,
    # cg_rtol_max).  The next iteration's rtol is computed INSIDE the
    # update program and stays a device scalar end to end: through the
    # tunnel an extra per-iteration program dispatch + host sync costs
    # ~100 ms, which at late-trajectory CG counts of ~2 would dominate
    # the iteration.
    forcing = os.environ.get("BENCH_FORCING", "adaptive")
    adaptive_forcing = forcing == "adaptive"
    rtol_now = None
    if adaptive_forcing:
        rtol_now = jnp.asarray(params.cg_rtol_max, vs.dtype)

        def update_with_rtol(design, phys, u, vsens):
            new_design, lam, bi, bv, fsens = vs.step_update(
                design, phys, u, vsens)
            change = jnp.max(jnp.abs(new_design - design))
            rtol = jnp.clip(params.cg_forcing_coeff * change,
                            params.cg_rtol, params.cg_rtol_max
                            ).astype(vs.dtype)
            return new_design, lam, bi, bv, fsens, rtol

        update_part = jax.jit(update_with_rtol)
        log(f"adaptive CG forcing: rtol in [{params.cg_rtol:g}, "
            f"{params.cg_rtol_max:g}], coeff {params.cg_forcing_coeff:g} "
            f"(on-device schedule)")

    pending_cg = None

    def one_step(design, u, pvecs):
        nonlocal first_exec, mg_state, steps_since_setup, cg_baseline, \
            last_cg, rhist, rtol_now, pending_cg
        if pending_cg is not None:
            # Deferred read of the PREVIOUS iteration's CG count: by now
            # that iteration was block_until_ready'd, so this int() costs
            # nothing — reading it right after cg_part would stall the
            # update-program dispatch on the full CG solve (the only
            # mid-iteration host round-trip in the loop; VERDICT r3 item 9).
            last_cg = int(pending_cg)
            pending_cg = None
            if cg_baseline is None:
                cg_baseline = last_cg
        solve_kw = {}
        if rhist is not None:
            solve_kw["recycle"] = rhist
        if adaptive_forcing:
            solve_kw["rtol"] = rtol_now
        if use_split3:
            # Stale-M refresh cadence (mirrors the driver's mg_setup_every;
            # CG applies the CURRENT operator either way).  The default
            # filter here is "sensitivity", so phys == design between
            # refreshes.
            # additive slack matters at adaptive-forcing CG counts of ~2,
            # where 1.5x alone would refresh on a single extra iteration
            degraded = (last_cg is not None and cg_baseline
                        and last_cg > max(1.5 * cg_baseline,
                                          cg_baseline + 3))
            if mg_state is None or steps_since_setup >= setup_every \
                    or degraded:
                phys, mg_state, pvecs = pre_part(design, pvecs, free_mask)
                steps_since_setup = 0
                cg_baseline = None
            else:
                phys = (jax.jit(vs.filt.density_filter)(design)
                        if vs.use_density_filter else design)
            steps_since_setup += 1
            if first_exec:
                jax.block_until_ready(pvecs)
            u, energy, volume, cg_iters, cg_res = cg_part(
                design, phys, mg_state, u, f_ext, free_mask, **solve_kw)
            pending_cg = cg_iters
        else:
            phys, u, energy, volume, cg_iters, cg_res, pvecs = solve_part(
                design, u, pvecs, f_ext, free_mask, **solve_kw)
        if rhist is not None:
            rhist = push_jit(rhist, u)
        if first_exec:
            # First execution in this process: drain each program before
            # compiling/loading the next — keeps program load and execution
            # from overlapping on the device (suspected trigger of the
            # first-execution "TPU device error" flake).
            jax.block_until_ready(u)
        if adaptive_forcing:
            new_design, lam, bi, bv, fsens, rtol_now = update_part(
                design, phys, u, vsens)
        else:
            new_design, lam, bi, bv, fsens = update_part(
                design, phys, u, vsens)
        first_exec = False
        return new_design, u, pvecs, energy, cg_iters

    def save():
        _save_ckpt(ckpt_path, design, u, pvecs, done_iters, early_t,
                   late_t, cgs)

    design, u, pvecs, energy, cg_iters = one_step(design, u, pvecs)
    jax.block_until_ready(design)
    done_iters += 1
    log(f"compile+first step: {time.time() - t0:.1f}s; "
        f"energy {float(energy):.6e} cg {int(cg_iters)}")
    if not np.isfinite(float(energy)):
        # A NaN solve makes every subsequent "iteration" a no-op (CG exits
        # immediately), producing an absurdly fast, meaningless it/s — fail
        # the attempt instead of recording garbage (round 3 hit exactly
        # this with a TPU-only numeric fault).
        log("FIRST STEP PRODUCED NON-FINITE ENERGY — failing this attempt")
        sys.exit(3)
    compile_s = round(time.time() - t0, 1)
    save()

    # The timed windows collect PER-ITERATION wall times (each iteration
    # synced with block_until_ready), checkpointed as they accumulate:
    # under the round-3 tunnel fault regime a 10-iteration unbroken window
    # may never complete, but every finished iteration's sample survives
    # into the next attempt.  Per-iteration sync costs only the ~ms
    # dispatch pipelining between genuinely data-dependent iterations.
    late_start = int(os.environ.get("BENCH_LATE_START", "50"))
    skip_late = os.environ.get("BENCH_SKIP_LATE", "0") == "1"
    early_end = 2 + n_timed

    def timed_step(design, u, pvecs, samples):
        t1 = time.time()
        design, u, pvecs, energy, cg_iters = one_step(design, u, pvecs)
        jax.block_until_ready(design)
        samples.append(time.time() - t1)
        cgs.append(int(cg_iters))
        return design, u, pvecs, energy, cg_iters

    while done_iters < early_end and len(early_t) < n_timed:
        design, u, pvecs, energy, cg_iters = timed_step(design, u, pvecs,
                                                        early_t)
        done_iters += 1
        save()
    if early_t:
        log(f"EARLY: {len(early_t)} samples -> "
            f"{len(early_t) / sum(early_t):.2f} it/s; cg {int(cg_iters)}; "
            f"energy {float(energy):.6e}")

    # Honest LATE-trajectory measurement: advance to a developed design
    # (SIMP contrast ~1e9 between void and solid instead of the mild
    # contrast of iterations 3-12), then time again.  The reported headline
    # value is the LATE figure — the one a real 50+-iteration optimization
    # actually sustains (round-2 VERDICT item 4).
    if not skip_late:
        while done_iters < late_start:
            chunk = min(8, late_start - done_iters)
            for _ in range(chunk):
                design, u, pvecs, energy, cg_iters = one_step(design, u,
                                                              pvecs)
            jax.block_until_ready(design)
            done_iters += chunk
            # a fault costs <= 8 iterations, not the whole advance
            save()
        while len(late_t) < n_timed:
            design, u, pvecs, energy, cg_iters = timed_step(design, u,
                                                            pvecs, late_t)
            done_iters += 1
            save()
        log(f"LATE (from iter {late_start + 1}): {len(late_t)} samples -> "
            f"{len(late_t) / sum(late_t):.2f} it/s; cg {int(cg_iters)}; "
            f"energy {float(energy):.6e}")
        if not np.isfinite(float(energy)):
            log("LATE TRAJECTORY NON-FINITE — failing this attempt")
            sys.exit(3)

    early_its = len(early_t) / sum(early_t) if early_t else None
    early_cg = (int(cgs[len(early_t) - 1])
                if early_t and len(cgs) >= len(early_t) else None)
    late_its = len(late_t) / sum(late_t) if late_t else None
    late_cg = int(cgs[-1]) if cgs else None
    headline = late_its if late_its is not None else early_its
    if headline is None:
        log("no timed samples collected")
        sys.exit(4)
    # JSON goes out BEFORE the optional phase breakdown: a TPU fault inside
    # the breakdown's extra programs must not discard a completed
    # measurement (it wedges the process, so guard + flush-first).
    print(json.dumps({
        "metric": f"simp_iterations_per_sec_{nx}x{ny}x{nz}",
        "value": round(headline, 3),
        "unit": "iters/sec",
        "vs_baseline": round(headline / 5.0, 3),
        "early_its": None if early_its is None else round(early_its, 3),
        "early_cg": early_cg,
        "late_its": None if late_its is None else round(late_its, 3),
        "late_cg": late_cg, "late_start_iter": late_start,
        "compile_s": compile_s,
        "config": {"mg_dtype": mg_dtype, "smooth": params.mg_smooth_iters,
                   "cycle": params.mg_cycle, "recycle_k": recycle_k,
                   "forcing": forcing},
    }), flush=True)
    if with_phases:
        try:
            _phase_breakdown(vs, design, u, pvecs)
        except Exception as e:  # noqa: BLE001 — diagnostics only
            log(f"phase breakdown aborted: {e}")


def main():
    # Fresh TPU processes nondeterministically die with "UNAVAILABLE: TPU
    # device error" on the FIRST execution of a heavy program (measured
    # ~30-50% of processes in round 2, INDEPENDENT of which program — the
    # identical child both passed and faulted back-to-back).  The
    # measurement itself is stable once a process gets through, so retry
    # the fused path several times (compiles are cheap now that the
    # persistent cache works), with a settle delay between attempts,
    # before falling back to the XLA path.
    attempts = [("1", "fused Pallas matvec")] * 6 + [("0", "XLA matvec")] * 2
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2700"))
    t_start = time.time()
    attempt_log = []
    # Cross-attempt measurement checkpoint: children save trajectory state
    # at phase boundaries and resume it, so each TPU fault costs at most a
    # few iterations instead of the whole ~60-iteration measurement.
    ckpt = os.environ.get("BENCH_CKPT", "/tmp/easysimp_bench_ckpt.npz")
    os.environ["BENCH_CKPT"] = ckpt
    for stale in (ckpt, ckpt + ".tmp.npz"):
        if os.path.exists(stale):
            os.remove(stale)
    for k, (flag, name) in enumerate(attempts):
        if k:
            name = f"{name} (attempt {k + 1})"
        if flag == "1" and k and time.time() - t_start > budget_s:
            # Out of budget for fused retries: jump to the reliable XLA
            # fallback so SOME measurement is always recorded before any
            # external timeout.  (Budget checked BEFORE the settle sleep so
            # exhausted budgets don't burn 20 s per skipped attempt.)
            log(f"budget {budget_s:.0f}s exhausted; skipping to XLA fallback")
            attempt_log.append({"name": name, "skipped": "budget"})
            continue
        if k:
            time.sleep(20)
        env = dict(os.environ, BENCH_CHILD="1", BENCH_USE_PALLAS=flag)
        log(f"--- bench attempt: {name} ---")
        t_att = time.time()
        # Hard per-child wall cap: a dead TPU tunnel hangs children inside
        # backend init (observed 25+ min at jax.devices() during the
        # round-3 relay outage) — without this the whole bench would hang
        # instead of cycling attempts / reporting failure.
        child_cap = float(os.environ.get("BENCH_CHILD_TIMEOUT_S", "2400"))
        try:
            proc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                env=env, stdout=subprocess.PIPE, text=True,
                timeout=child_cap)
        except subprocess.TimeoutExpired as e:
            stdout = e.stdout or b""
            if isinstance(stdout, bytes):
                stdout = stdout.decode(errors="replace")
            tail = stdout.strip().splitlines()[-1:] or ["<no output>"]
            log(f"attempt '{name}' timed out after {child_cap:.0f}s "
                f"(last stdout: {tail[0][:200]})")
            attempt_log.append({
                "name": name, "rc": "timeout", "ok": False,
                "wall_s": round(time.time() - t_att, 1),
            })
            continue
        out = proc.stdout.strip().splitlines()
        json_lines = [l for l in out if l.startswith("{")]
        attempt_log.append({
            "name": name, "rc": proc.returncode,
            "ok": bool(json_lines), "wall_s": round(time.time() - t_att, 1),
        })
        if json_lines:
            # A JSON line means the measurement completed; a nonzero exit
            # after that (e.g. a fault in optional diagnostics) is logged
            # but does not invalidate the number.
            if proc.returncode != 0:
                log(f"attempt '{name}': measurement ok, child exited "
                    f"rc={proc.returncode} afterwards")
            # Per-attempt statistics ride in the artifact itself so fault
            # rates are data, not stderr folklore (round-2 VERDICT item 4).
            payload = json.loads(json_lines[-1])
            payload["attempts"] = attempt_log
            print(json.dumps(payload), flush=True)
            return
        log(f"attempt '{name}' failed (rc={proc.returncode}); retrying")
    if _emit_from_checkpoint(ckpt, attempt_log):
        return
    log("all attempts failed")
    sys.exit(1)


def _emit_from_checkpoint(ckpt, attempt_log):
    """Last-resort JSON from the per-iteration samples the children banked.

    Under the round-3 fault regime no single child may survive long enough
    to finish a phase, but every completed iteration's wall time is in the
    checkpoint — so the measurement those iterations represent is still
    reportable (flagged `from_checkpoint` so the artifact is honest about
    how it was obtained)."""
    if not os.path.exists(ckpt):
        return False
    try:
        ck = dict(np.load(ckpt, allow_pickle=False))
    except Exception as e:  # noqa: BLE001 — diagnostics-path only
        log(f"checkpoint fallback unreadable: {e}")
        return False
    early_t = np.asarray(ck.get("early_t", []), dtype=np.float64)
    late_t = np.asarray(ck.get("late_t", []), dtype=np.float64)
    cgs = np.asarray(ck.get("cgs", []), dtype=np.int64)
    samples = late_t if late_t.size else early_t
    if not samples.size:
        return False
    nels = tuple(int(v) for v in
                 os.environ.get("BENCH_NELS", "128,128,128").split(","))
    headline = samples.size / float(samples.sum())
    log(f"all attempts faulted; reporting {samples.size} banked "
        f"{'late' if late_t.size else 'early'} samples from the checkpoint")
    print(json.dumps({
        "metric": "simp_iterations_per_sec_{}x{}x{}".format(*nels),
        "value": round(headline, 3),
        "unit": "iters/sec",
        "vs_baseline": round(headline / 5.0, 3),
        "early_its": (round(early_t.size / float(early_t.sum()), 3)
                      if early_t.size else None),
        "early_cg": (int(cgs[early_t.size - 1])
                     if early_t.size and cgs.size >= early_t.size else None),
        "late_its": (round(late_t.size / float(late_t.sum()), 3)
                     if late_t.size else None),
        "late_cg": int(cgs[-1]) if cgs.size else None,
        "from_checkpoint": True, "attempts": attempt_log,
    }), flush=True)
    return True


if __name__ == "__main__":
    if os.environ.get("BENCH_SHARDED"):
        # evidence mode: virtual-device mesh + collective counts (see
        # run_sharded_evidence) — opt-in, never the driver default.
        flag = ("--xla_force_host_platform_device_count="
                + os.environ["BENCH_SHARDED"])
        if "xla_force_host_platform_device_count" not in \
                os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "") + " " + flag).strip()
        run_sharded_evidence(int(os.environ["BENCH_SHARDED"]))
    elif os.environ.get("BENCH_CHILD") == "1":
        run_measurement()
    else:
        main()
