"""TPU fault-isolation harness: ONE suspect program composition per process.

The tunneled TPU wedges its whole process on a fault, so every mode runs an
independent composition; bisect by running modes in separate processes.
Used to root-cause the round-2 128^3 faults (see CLAUDE.md lore + PARITY.md):
the OC-next-to-solve composition (fixed via the two-program step) and the
program-complexity-dependent infra flake.

Usage: python scripts/tpu_fault_isolation.py <mode>
  mv / en       single fused kernel, 20 applications (+parity vs XLA)
  mv_small      small-level kernels (8/16/32^3) correctness on real TPU
  mv2           two kernel variants in ONE program
  mv_loop       kernel inside lax.while_loop (CG-like)
  pw/pw1/pw1d/pw2/pw3  power-iteration compositions (KT_MG_LEVELS=n to cap)
  solve / solve_bf16   full MG-CG solve (optionally bfloat16 cycle)
  step_split    the production two-program iteration
  step_full / step_noen / sens_path / oc_path / sens_oc   step compositions
  upd           step_update (sens+filter+OC) alone, timed
  oc_plus_mv    single matvec + OC bisection in one program
  gal_build     Galerkin stencil build (_prep_levels) alone, x10
  gal_apply     level-1 stencil apply alone, x20
  gal_cho       stencil build + stencil_to_dense + Cholesky + solve, x10
  gal_vcycle    MG setup once, then the V-cycle M(r) x10 (own program)
  gal_solve     step_solve (filter + MG-CG) alone, x5 warm executions
Env: KT_NELS=nx,ny,nz (default 128^3), KT_GALERKIN=0/1, KT_SMOOTH="(1, 3)",
     KT_CYCLE=v|w, EASYSIMP_PALLAS_MIN_DIM/_VMEM_MB.
"""
import os, sys, time
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
if len(sys.argv) < 2:
    print(__doc__)
    sys.exit(2)
mode = sys.argv[1]
nels = tuple(int(v) for v in os.environ.get("KT_NELS", "128,128,128").split(","))

import jax
if os.environ.get("KT_PLATFORM"):
    # CPU validation of the harness itself (JAX_PLATFORMS env is ignored by
    # the site hook — must be the explicit config update).
    jax.config.update("jax_platforms", os.environ["KT_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jax_comp_cache"))
import jax.numpy as jnp
import numpy as np
import easysimp_tpu as et
from easysimp_tpu.ops.pallas_kernels import (
    make_pallas_matvec, make_pallas_energies, select_blocks)

grid = et.generate_grid(nels, (0.0, 0.0, 0.0), tuple(float(n) for n in nels))
op = et.VoxelOperator(grid, dtype=jnp.float32)
blocks = select_blocks(grid.nels)
print("blocks:", blocks, flush=True)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((*grid.nnodes_per_axis, 3)), dtype=jnp.float32)
rho = jnp.asarray(rng.uniform(0.05, 1.0, grid.nels), dtype=jnp.float32)
scale = op.youngs_modulus(rho)

t0 = time.time()
if mode == "mv":
    mv = jax.jit(make_pallas_matvec(op, block=blocks))
    out = mv(u, scale); jax.block_until_ready(out)
    print(f"compile {time.time()-t0:.1f}s; norm {float(jnp.linalg.norm(out)):.6e}", flush=True)
    want = jax.jit(op.apply_K)(u, scale)
    err = float(jnp.linalg.norm(out - want) / jnp.linalg.norm(want))
    print("rel err vs XLA:", err, flush=True)
    t0 = time.time()
    for _ in range(20):
        out = mv(u, scale)
    jax.block_until_ready(out)
    print(f"20 applications: {(time.time()-t0)/20*1e3:.2f} ms each", flush=True)
elif mode == "en":
    en = jax.jit(make_pallas_energies(op, block=blocks))
    out = en(u); jax.block_until_ready(out)
    print(f"compile {time.time()-t0:.1f}s; norm {float(jnp.linalg.norm(out)):.6e}", flush=True)
    want = jax.jit(lambda v: jnp.sum(op.apply_elements(v)[0] * op.apply_elements(v)[1], axis=-1))(u)
    err = float(jnp.linalg.norm(out - want) / jnp.linalg.norm(want))
    print("rel err vs XLA:", err, flush=True)
    t0 = time.time()
    for _ in range(20):
        out = en(u)
    jax.block_until_ready(out)
    print(f"20 applications: {(time.time()-t0)/20*1e3:.2f} ms each", flush=True)
elif mode == "mv_loop":
    mv = make_pallas_matvec(op, block=blocks)
    @jax.jit
    def loop(u, scale):
        def body(st):
            k, v = st
            w = mv(v, scale)
            return k + 1, w / jnp.linalg.norm(w)
        return jax.lax.while_loop(lambda st: st[0] < 50, body, (0, u))
    k, v = loop(u, scale); jax.block_until_ready(v)
    print(f"compile+50 loop matvecs {time.time()-t0:.1f}s; norm {float(jnp.linalg.norm(v)):.6e}", flush=True)
print("OK", mode, flush=True)

def build_step(use_pallas=True, mg_dtype=""):
    import ast
    from easysimp_tpu.opt.optimize import build_voxel_step
    nx, ny, nz = nels
    g = et.generate_grid(nels, (0.0, 0.0, 0.0), tuple(float(n) for n in nels))
    bc = et.apply_fixed_boundary(g, et.select_nodes_by_plane(g, [0,0,0], [1,0,0], 1e-6))
    load = et.PointLoad(et.select_nodes_by_box(g, [nx,0,0], [nx,0,nz]), [0.,-1.,0.])
    params = et.OptimizationParameters(E0=1.0, Emin=1e-9, nu=0.3, p=3.0,
        volume_fraction=0.3, filter_radius=1.5, dtype="float32", cg_rtol=1e-5,
        cg_maxiter=500, preconditioner="multigrid", use_pallas_matvec=use_pallas,
        mg_cycle_dtype=mg_dtype,
        mg_galerkin=os.environ.get("KT_GALERKIN", "1") == "1",
        mg_cycle=os.environ.get("KT_CYCLE", "v"),
        mg_smooth_iters=ast.literal_eval(os.environ.get("KT_SMOOTH", "(1, 3)")),
        mg_levels=int(os.environ.get("KT_MG_LEVELS", "0")))
    return build_voxel_step(g, [load], [bc], params)

def run_steps(vs, n=3):
    step = jax.jit(vs.step)
    design, uu, pv = vs.design0, vs.u0, vs.pvecs0
    if vs.power_init is not None:
        pv = jax.jit(vs.power_init)(design, vs.step_args[1])
    for k in range(n):
        outs = step(design, uu, pv, *vs.step_args)
        jax.block_until_ready(outs)
        print(f"step {k}: energy {float(outs[3]):.6e} cg {int(outs[6])}", flush=True)
        design, uu, pv = outs[0], outs[1], outs[-1]

if mode == "step_full":
    vs = build_step(True)
    run_steps(vs)
elif mode == "step_noen":
    vs = build_step(True)
    vs.op._fused_energies = None     # matvec kernels only
    run_steps(vs)
elif mode == "step_nomg_pallas":
    vs = build_step(True)
    # strip pallas from MG coarse levels? not reachable here; skip
    run_steps(vs)
elif mode == "oc_plus_mv":
    # minimal: one pallas matvec + the 15-candidate OC volume matmul
    from easysimp_tpu.ops.oc import oc_update
    mv = make_pallas_matvec(op, block=blocks)
    vsens = jnp.full(grid.nels, 1.0 / grid.n_cells, dtype=jnp.float32)
    @jax.jit
    def prog(design, uu, scale):
        w = mv(uu, scale)
        sens = -jnp.sum(w * uu, axis=-1)[:-1, :-1, :-1] * design
        nd, lam, it, verr = oc_update(design, sens, vsens, 0.3,
            float(grid.n_cells), 1.0, 0.2, 0.5,
            volume_weights=vsens * grid.n_cells)
        return nd, lam, it, verr, w
    nd, lam, it, verr, w = prog(rho, u, scale)
    jax.block_until_ready(nd)
    print(f"oc_plus_mv OK: lam {float(lam):.3e} it {int(it)}", flush=True)
    for _ in range(5):
        nd, lam, it, verr, w = prog(nd, u, scale)
    jax.block_until_ready(nd)
    print("oc_plus_mv 5 more OK", flush=True)

if mode == "solve":
    vs = build_step(True)
    pv = vs.pvecs0
    if vs.power_init is not None:
        pv = jax.jit(vs.power_init)(vs.design0, vs.step_args[1])
        jax.block_until_ready(pv)
        print("power_init OK", flush=True)
    out = jax.jit(vs.solve)(vs.design0, pv, *vs.step_args)
    jax.block_until_ready(out)
    print(f"solve OK: energy {float(out[2]):.6e}", flush=True)
elif mode == "step_nomgk":
    # fine-level pallas only: MG coarse levels get NO pallas kernels
    import easysimp_tpu.ops.pallas_kernels as pk
    orig = pk.install_fused_matvec
    calls = []
    def once(op_, **kw):
        if calls:
            return False
        calls.append(1)
        return orig(op_, **kw)
    pk.install_fused_matvec = once
    vs = build_step(True)
    print("installs allowed:", len(calls), flush=True)
    run_steps(vs)

if mode == "mv_small":
    # Real-TPU correctness of the SMALL-level kernels (16^3, 8^3): compare
    # against the XLA path in separate programs.
    for sn in ((16, 16, 16), (8, 8, 8), (32, 32, 32)):
        sg = et.generate_grid(sn, (0.0, 0.0, 0.0), tuple(float(v) for v in sn))
        so = et.VoxelOperator(sg, dtype=jnp.float32)
        sb = select_blocks(sn)
        mv_s = jax.jit(make_pallas_matvec(so, block=sb))
        us = jnp.asarray(np.random.default_rng(5).standard_normal(
            (*sg.nnodes_per_axis, 3)), dtype=jnp.float32)
        ssc = so.youngs_modulus(jnp.asarray(
            np.random.default_rng(6).uniform(0.05, 1.0, sg.nels), jnp.float32))
        got = mv_s(us, ssc); jax.block_until_ready(got)
        want = jax.jit(so.apply_K)(us, ssc)
        err = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        print(f"mv_small {sn} blocks {sb}: rel err {err:.3e}", flush=True)
    print("mv_small OK", flush=True)

if mode == "mv2":
    # TWO different pallas kernels (128-grid + 64-grid) in ONE jitted program
    c_nels = tuple(n // 2 for n in nels)
    cgrid = et.generate_grid(c_nels, (0.0, 0.0, 0.0),
                             tuple(float(n) for n in c_nels))
    cop = et.VoxelOperator(cgrid, dtype=jnp.float32)
    cblocks = select_blocks(cgrid.nels)
    print("coarse blocks:", cblocks, flush=True)
    mv_f = make_pallas_matvec(op, block=blocks)
    mv_c = make_pallas_matvec(cop, block=cblocks)
    uc = jnp.asarray(np.random.default_rng(1).standard_normal(
        (*cgrid.nnodes_per_axis, 3)), dtype=jnp.float32)
    sc = cop.youngs_modulus(jnp.asarray(
        np.random.default_rng(2).uniform(0.05, 1.0, cgrid.nels), jnp.float32))
    @jax.jit
    def both(u, scale, uc, sc):
        a = mv_f(u, scale)
        b = mv_c(uc, sc)
        return jnp.vdot(a, a) + jnp.vdot(b, b)
    out = both(u, scale, uc, sc); jax.block_until_ready(out)
    print(f"mv2 compile+run {time.time()-t0:.1f}s: {float(out):.6e}", flush=True)
    for _ in range(10):
        out = both(u, scale, uc, sc)
    jax.block_until_ready(out)
    print("mv2 x10 OK", flush=True)

if mode == "pw1":
    # Single-level chained power iteration: 10x (pallas apply -> div ->
    # vdot/sqrt -> normalize) on the 128 grid only.
    mv = make_pallas_matvec(op, block=blocks)
    mask = jnp.ones((*grid.nnodes_per_axis, 3), jnp.float32)
    diag = op.diagonal(scale, mask)
    @jax.jit
    def pw1(v, scale):
        lam = jnp.float32(1.0)
        for _ in range(10):
            w = mv(v, scale) / diag
            lam = jnp.sqrt(jnp.vdot(w, w) / jnp.maximum(jnp.vdot(v, v), 1e-30))
            v = w / jnp.maximum(jnp.sqrt(jnp.vdot(w, w)), 1e-30)
        return lam, v
    lam, v = pw1(u, scale)
    jax.block_until_ready(v)
    print(f"pw1 compile+run {time.time()-t0:.1f}s: lam {float(lam):.4e}", flush=True)
    for _ in range(5):
        lam, v = pw1(v, scale)
    jax.block_until_ready(v)
    print("pw1 x5 OK", flush=True)

if mode in ("pw1d", "pw2"):
    mv = make_pallas_matvec(op, block=blocks)
    mask = jnp.ones((*grid.nnodes_per_axis, 3), jnp.float32)
    if mode == "pw1d":
        @jax.jit
        def prog(v, scale):
            diag = op.diagonal(scale, mask)   # stencil conv INSIDE the program
            lam = jnp.float32(1.0)
            for _ in range(10):
                w = mv(v, scale) / diag
                lam = jnp.sqrt(jnp.vdot(w, w) / jnp.maximum(jnp.vdot(v, v), 1e-30))
                v = w / jnp.maximum(jnp.sqrt(jnp.vdot(w, w)), 1e-30)
            return lam, v
        lam, v = prog(u, scale)
        jax.block_until_ready(v)
        print(f"pw1d OK: lam {float(lam):.4e}", flush=True)
    else:
        c_nels = tuple(n // 2 for n in nels)
        cgrid = et.generate_grid(c_nels, (0.0, 0.0, 0.0),
                                 tuple(float(n) for n in c_nels))
        cop = et.VoxelOperator(cgrid, dtype=jnp.float32)
        mv_c = make_pallas_matvec(cop, block=select_blocks(cgrid.nels))
        cmask = jnp.ones((*cgrid.nnodes_per_axis, 3), jnp.float32)
        uc = jnp.asarray(np.random.default_rng(1).standard_normal(
            (*cgrid.nnodes_per_axis, 3)), dtype=jnp.float32)
        @jax.jit
        def prog(v, vc, scale):
            sc = scale.reshape(c_nels[0], 2, c_nels[1], 2, c_nels[2], 2
                               ).mean(axis=(1, 3, 5))
            diag = op.diagonal(scale, mask)
            diag_c = cop.diagonal(sc, cmask)
            lams = []
            for m, d, vv, s in ((mv, diag, v, scale), (mv_c, diag_c, vc, sc)):
                lam = jnp.float32(1.0)
                for _ in range(10):
                    w = m(vv, s) / d
                    lam = jnp.sqrt(jnp.vdot(w, w) /
                                   jnp.maximum(jnp.vdot(vv, vv), 1e-30))
                    vv = w / jnp.maximum(jnp.sqrt(jnp.vdot(w, w)), 1e-30)
                lams.append(lam)
            return lams
        lams = prog(u, uc, scale)
        jax.block_until_ready(lams)
        print(f"pw2 OK: lams {[float(l) for l in lams]}", flush=True)

if mode == "pw3":
    # pallas-128 chain + ONE small-level XLA-path power chain (32^3), the
    # composition that distinguishes pw (failing) from pw2 (passing).
    mv = make_pallas_matvec(op, block=blocks)
    mask = jnp.ones((*grid.nnodes_per_axis, 3), jnp.float32)
    s_nels = tuple(n // 4 for n in nels)
    sgrid = et.generate_grid(s_nels, (0.0, 0.0, 0.0),
                             tuple(float(n) for n in s_nels))
    sop = et.VoxelOperator(sgrid, dtype=jnp.float32)   # NO pallas installed
    smask = jnp.ones((*sgrid.nnodes_per_axis, 3), jnp.float32)
    us = jnp.asarray(np.random.default_rng(3).standard_normal(
        (*sgrid.nnodes_per_axis, 3)), dtype=jnp.float32)
    ss = sop.youngs_modulus(jnp.asarray(
        np.random.default_rng(4).uniform(0.05, 1.0, sgrid.nels), jnp.float32))
    @jax.jit
    def prog(v, vs_, scale, ss):
        diag = op.diagonal(scale, mask)
        sdiag = sop.diagonal(ss, smask)
        lam = jnp.float32(1.0)
        for _ in range(10):
            w = mv(v, scale) / diag
            lam = jnp.sqrt(jnp.vdot(w, w) / jnp.maximum(jnp.vdot(v, v), 1e-30))
            v = w / jnp.maximum(jnp.sqrt(jnp.vdot(w, w)), 1e-30)
        lam_s = jnp.float32(1.0)
        for _ in range(10):
            w = sop.apply(vs_, ss, smask) / sdiag      # XLA gather path
            lam_s = jnp.sqrt(jnp.vdot(w, w) /
                             jnp.maximum(jnp.vdot(vs_, vs_), 1e-30))
            vs_ = w / jnp.maximum(jnp.sqrt(jnp.vdot(w, w)), 1e-30)
        return lam, lam_s
    lam, lam_s = prog(u, us, scale, ss)
    jax.block_until_ready(lam)
    print(f"pw3 OK: lam {float(lam):.4e} lam_s {float(lam_s):.4e}", flush=True)

if mode == "pw":
    # power_init alone (the program the serialized bench faults in)
    vs = build_step(True)
    pv = jax.jit(vs.power_init)(vs.design0, vs.step_args[1])
    jax.block_until_ready(pv)
    print("pw OK", flush=True)

if mode == "mv_bf16":
    op16 = et.VoxelOperator(grid, dtype=jnp.bfloat16)
    mv = jax.jit(make_pallas_matvec(op16, block=blocks))
    u16 = u.astype(jnp.bfloat16)
    s16 = scale.astype(jnp.bfloat16)
    out = mv(u16, s16); jax.block_until_ready(out)
    print(f"bf16 compile {time.time()-t0:.1f}s; norm {float(jnp.linalg.norm(out.astype(jnp.float32))):.6e}", flush=True)
    want = jax.jit(op.apply_K)(u, scale)
    err = float(jnp.linalg.norm(out.astype(jnp.float32) - want) / jnp.linalg.norm(want))
    print("rel err vs fp32 XLA:", err, flush=True)
    t0 = time.time()
    for _ in range(20):
        out = mv(u16, s16)
    jax.block_until_ready(out)
    print(f"bf16 20 applications: {(time.time()-t0)/20*1e3:.2f} ms each", flush=True)

if mode == "solve_bf16":
    vs = build_step(True, mg_dtype="bfloat16")
    pv = vs.pvecs0
    if vs.power_init is not None:
        pv = jax.jit(vs.power_init)(vs.design0, vs.step_args[1])
        jax.block_until_ready(pv)
        print("power_init OK", flush=True)
    sol = jax.jit(vs.step_solve)
    t0 = time.time()
    out = sol(vs.design0, vs.u0, pv, vs.step_args[0], vs.step_args[1])
    jax.block_until_ready(out)
    print(f"bf16-cycle solve compile+run {time.time()-t0:.1f}s: "
          f"energy {float(out[2]):.6e} cg {int(out[4])}", flush=True)
    design, uu = vs.design0, out[1]
    t0 = time.time()
    for k in range(5):
        out = sol(design, uu, out[-1], vs.step_args[0], vs.step_args[1])
        uu = out[1]
    jax.block_until_ready(out)
    print(f"5 warm solves: {(time.time()-t0)/5*1e3:.1f} ms each, cg {int(out[4])}",
          flush=True)

if mode == "upd":
    # step_update (sens + filter + OC) alone, timed
    vs = build_step(True)
    f_ext, free_mask, vsens = vs.step_args
    upd = jax.jit(vs.step_update)
    design = vs.design0
    uu = jnp.asarray(np.random.default_rng(7).standard_normal(
        (*grid.nnodes_per_axis, 3)) * 0.01, dtype=jnp.float32)
    out = upd(design, design, uu, vsens)
    jax.block_until_ready(out)
    print(f"upd compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(20):
        out = upd(design, design, uu, vsens)
    jax.block_until_ready(out)
    print(f"upd 20x: {(time.time()-t0)/20*1e3:.2f} ms each", flush=True)

if mode == "step_split":
    # the production two-program iteration (driver/bench path after the fix)
    vs = build_step(True)
    f_ext, free_mask, vsens = vs.step_args
    solve_part = jax.jit(vs.step_solve)
    update_part = jax.jit(vs.step_update)
    design, uu, pv = vs.design0, vs.u0, vs.pvecs0
    if vs.power_init is not None:
        pv = jax.jit(vs.power_init)(design, free_mask)
    for k in range(6):
        phys, uu, energy, volume, cg_iters, cg_res, pv = solve_part(
            design, uu, pv, f_ext, free_mask)
        design, lam, bi, bv, fs = update_part(design, phys, uu, vsens)
        jax.block_until_ready(design)
        print(f"split step {k}: energy {float(energy):.6e} cg {int(cg_iters)}",
              flush=True)
    print("step_split OK", flush=True)

if mode == "bw":
    # Direct HBM streaming-bandwidth probe: z = x + y at several sizes
    # (traffic = 3 * nbytes per run).  Settles the roofline question — the
    # round-2 "VPU-compute-bound" reading of the fused matvec assumed v5e
    # spec bandwidth; if the tunnel chip actually streams ~40 GB/s, every
    # kernel is bandwidth-bound and the optimization targets flip.
    add = jax.jit(lambda a, b: a + b)
    for mb in (64, 256, 1024):
        n = mb * 1024 * 1024 // 4
        x = jnp.ones((n,), jnp.float32)
        y = jnp.full((n,), 2.0, jnp.float32)
        z = add(x, y); jax.block_until_ready(z)
        t1 = time.time()
        reps = 8
        for _ in range(reps):
            z = add(x, z)
        jax.block_until_ready(z)
        dt_s = (time.time() - t1) / reps
        gbps = 3 * mb / 1024 / dt_s
        print(f"bw fp32 {mb} MB: {dt_s*1e3:.2f} ms -> {gbps:.1f} GB/s",
              flush=True)
    xb = jnp.ones((256 * 1024 * 1024 // 2,), jnp.bfloat16)
    addb = jax.jit(lambda a, b: a + b)
    zb = addb(xb, xb); jax.block_until_ready(zb)
    t1 = time.time()
    for _ in range(8):
        zb = addb(xb, zb)
    jax.block_until_ready(zb)
    dt_s = (time.time() - t1) / 8
    print(f"bw bf16 256 MB: {dt_s*1e3:.2f} ms -> {3 * 256 / 1024 / dt_s:.1f} "
          f"GB/s", flush=True)
    # 8-stream fused read (apply_stencil-shaped: many inputs, one output)
    xs = [jnp.full((64 * 1024 * 1024 // 4,), float(i), jnp.float32)
          for i in range(8)]
    fma = jax.jit(lambda *a: sum(x * (i + 1.0) for i, x in enumerate(a)))
    w = fma(*xs); jax.block_until_ready(w)
    t1 = time.time()
    for _ in range(8):
        w = fma(*xs)
    jax.block_until_ready(w)
    dt_s = (time.time() - t1) / 8
    print(f"bw 8-stream fma 512 MB traffic: {dt_s*1e3:.2f} ms -> "
          f"{(8 + 1) * 64 / 1024 / dt_s:.1f} GB/s", flush=True)

if mode.startswith("gal_") and mode != "gal_solve":
    # Galerkin-path compositions (round-3: the Galerkin step_solve faults on
    # TPU where the identical arithmetic-coarsening program runs clean —
    # these modes bisect WHICH stencil op-class triggers it).
    import ast
    from easysimp_tpu.ops.multigrid import MultigridPreconditioner
    from easysimp_tpu.ops import stencil as stn
    if os.environ.get("KT_PALLAS", "1") == "1":
        from easysimp_tpu.ops.pallas_kernels import install_fused_matvec
        install_fused_matvec(op)
    mg = MultigridPreconditioner(
        op,
        smooth_iters=ast.literal_eval(os.environ.get("KT_SMOOTH", "(1, 3)")),
        galerkin=True, cycle=os.environ.get("KT_CYCLE", "v"))
    print(f"gal levels: {mg.n_levels}", flush=True)
    mask = jnp.ones((*grid.nnodes_per_axis, 3), jnp.float32).at[0].set(0.0)

    if mode == "gal_build":
        prep = jax.jit(mg._prep_levels)
        out = prep(scale, mask); jax.block_until_ready(out)
        print(f"gal_build compile+run {time.time()-t0:.1f}s", flush=True)
        for k in range(10):
            out = prep(scale, mask)
            jax.block_until_ready(out)
        s1 = out[2][1]
        print(f"gal_build x10 OK; |S1| {float(jnp.linalg.norm(s1)):.6e}",
              flush=True)
    elif mode == "gal_apply":
        prep = jax.jit(mg._prep_levels)
        scales, masks, stencils = prep(scale, mask)
        jax.block_until_ready(stencils[1])
        ap = jax.jit(stn.apply_stencil)
        v1 = jnp.asarray(rng.standard_normal(stencils[1].shape[5:8] + (3,)),
                         jnp.float32)
        w = ap(stencils[1], v1); jax.block_until_ready(w)
        print(f"gal_apply compile+run {time.time()-t0:.1f}s; "
              f"|w| {float(jnp.linalg.norm(w)):.6e}", flush=True)
        t0 = time.time()
        for _ in range(20):
            w = ap(stencils[1], w / jnp.linalg.norm(w))
        jax.block_until_ready(w)
        print(f"gal_apply x20 OK: {(time.time()-t0)/20*1e3:.2f} ms each",
              flush=True)
    elif mode == "gal_cho":
        @jax.jit
        def prog(scale, mask, r):
            scales, masks, stencils = mg._prep_levels(scale, mask)
            cho, dinv = mg._scaled_cholesky(stn.stencil_to_dense(stencils[-1]))
            x = dinv * jax.scipy.linalg.cho_solve(cho, dinv * r)
            return x
        nn = mg.ops[-1].grid.nnodes_per_axis
        r = jnp.asarray(rng.standard_normal(3 * int(np.prod(nn))), jnp.float32)
        x = prog(scale, mask, r); jax.block_until_ready(x)
        print(f"gal_cho compile+run {time.time()-t0:.1f}s; "
              f"|x| {float(jnp.linalg.norm(x)):.6e}", flush=True)
        for _ in range(10):
            x = prog(scale, mask, x / jnp.linalg.norm(x))
        jax.block_until_ready(x)
        print("gal_cho x10 OK", flush=True)
    elif mode == "gal_vcycle":
        setup = jax.jit(lambda s, m: mg.setup(s, m)[0])
        state = setup(scale, mask)
        jax.block_until_ready(state["lams"])
        print(f"gal_vcycle setup {time.time()-t0:.1f}s", flush=True)
        # cho_factor's `lower` flag must be STATIC inside the second program
        # (it crossed the jit boundary as an array): rebuild with the
        # default upper=False literal.
        vc = jax.jit(lambda st, r: mg._vcycle(
            0, {**st, "cho": ((st["cho"][0][0], False), st["cho"][1])}, r))
        r = jnp.asarray(rng.standard_normal((*grid.nnodes_per_axis, 3)),
                        jnp.float32) * mask
        t0 = time.time()
        x = vc(state, r); jax.block_until_ready(x)
        print(f"gal_vcycle compile+run {time.time()-t0:.1f}s; "
              f"|x| {float(jnp.linalg.norm(x)):.6e}", flush=True)
        t0 = time.time()
        for _ in range(10):
            x = vc(state, r)
        jax.block_until_ready(x)
        print(f"gal_vcycle x10 OK: {(time.time()-t0)/10*1e3:.2f} ms each",
              flush=True)

if mode == "gal_solve":
    vs = build_step(os.environ.get("KT_PALLAS", "1") == "1")
    f_ext, free_mask, vsens = vs.step_args
    pv = vs.pvecs0
    if vs.power_init_split is not None:
        pv = vs.power_init_split(vs.design0, free_mask)
    sol = jax.jit(vs.step_solve)
    design, uu = vs.design0, vs.u0
    out = sol(design, uu, pv, f_ext, free_mask)
    jax.block_until_ready(out[1])
    print(f"gal_solve compile+run {time.time()-t0:.1f}s: "
          f"energy {float(out[2]):.6e} cg {int(out[4])}", flush=True)
    for k in range(5):
        out = sol(design, out[1], out[-1], f_ext, free_mask)
        jax.block_until_ready(out[1])
        print(f"gal_solve warm {k + 1}: cg {int(out[4])}", flush=True)
    print("gal_solve OK", flush=True)


def _forward_parts(vs):
    f_ext, free_mask, vsens = vs.step_args
    return f_ext, free_mask, vsens

if mode in ("sens_path", "oc_path", "sens_oc"):
    from easysimp_tpu.ops.cg import cg_solve
    from easysimp_tpu.ops.oc import oc_update
    vs = build_step(True)
    vs.op._fused_energies = None
    f_ext, free_mask, vsens = _forward_parts(vs)
    opv, filt = vs.op, vs.filt
    pv = jax.jit(vs.power_init)(vs.design0, free_mask)

    def solve_part(design, uu, pvecs):
        # replicate forward() from the step builder via vs.solve internals:
        return None

    if mode == "sens_path":
        @jax.jit
        def prog(design, uu, pvecs):
            phys, u2, energy = vs.solve(design, pvecs, *vs.step_args)
            sens = opv.compliance_sensitivities(u2, phys)
            fsens = filt.sensitivity_filter(design, sens)
            return energy, fsens, u2
        e, fs, u2 = prog(vs.design0, vs.u0, pv)
        jax.block_until_ready(fs)
        print(f"sens_path OK: energy {float(e):.6e}", flush=True)
        for _ in range(3):
            e, fs, u2 = prog(vs.design0, u2, pv)
        jax.block_until_ready(fs)
        print("sens_path x3 OK", flush=True)
    elif mode == "oc_path":
        @jax.jit
        def prog(design, uu, pvecs):
            phys, u2, energy = vs.solve(design, pvecs, *vs.step_args)
            fake_sens = -(phys + 0.1)
            nd, lam, it, verr = oc_update(
                design, fake_sens, vsens, 0.3, vs.total_volume, vs.elem_vol,
                0.2, 0.5, volume_weights=vsens * vs.total_volume)
            return energy, nd, u2
        e, nd, u2 = prog(vs.design0, vs.u0, pv)
        jax.block_until_ready(nd)
        print(f"oc_path OK: energy {float(e):.6e}", flush=True)
        for _ in range(3):
            e, nd, u2 = prog(nd, u2, pv)
        jax.block_until_ready(nd)
        print("oc_path x3 OK", flush=True)
    elif mode == "sens_oc":
        @jax.jit
        def prog(design, uu, pvecs):
            phys, u2, energy = vs.solve(design, pvecs, *vs.step_args)
            sens = opv.compliance_sensitivities(u2, phys)
            fsens = filt.sensitivity_filter(design, sens)
            nd, lam, it, verr = oc_update(
                design, fsens, vsens, 0.3, vs.total_volume, vs.elem_vol,
                0.2, 0.5, volume_weights=vsens * vs.total_volume)
            return energy, nd, u2
        e, nd, u2 = prog(vs.design0, vs.u0, pv)
        jax.block_until_ready(nd)
        print(f"sens_oc OK: energy {float(e):.6e}", flush=True)
        for _ in range(3):
            e, nd, u2 = prog(nd, u2, pv)
        jax.block_until_ready(nd)
        print("sens_oc x3 OK", flush=True)
