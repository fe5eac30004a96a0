"""Hoist closed-over device arrays out of a function's XLA program.

jax.jit embeds closed-over arrays as LITERAL CONSTANTS in the lowered
HLO module.  For the unstructured path those closures are mesh-sized —
the per-element ke tensor alone is ~294 MB at 511k tets, plus
connectivity/pair-index/aggregation arrays — so the serialized program
ships hundreds of MB per compile.  On the tunneled TPU, whose relay
transports serialized modules over HTTP, that is a hard failure:
tet44's one-program step broke the transport ("Broken pipe") and the
split setup program alone exceeded the request cap ("HTTP 413: length
limit exceeded").  It also bloats compile time everywhere (XLA constant-
folds mesh-sized gathers at trace time — multi-second folds observed on
CPU) and duplicates the constants' HBM across executables.

`hoist_constants(f, *example_args)` traces `f` once, captures the jaxpr
consts (exactly the closed-over arrays), and returns a wrapper taking
them as a leading argument:

    g, consts = hoist_constants(us.step_setup, design)
    setup_jit = jax.jit(g)
    phys, state = setup_jit(consts, design)

The lowered module then receives the arrays as runtime PARAMETERS —
measured 967 kB -> 36 kB serialized HLO on a small tet problem, with
bit-identical outputs and identical output pytree structure.

(jax.closure_convert does NOT do this: it only converts closed-over
tracers, returning zero consts for plain device arrays.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import core
from jax.tree_util import tree_flatten, tree_unflatten

__all__ = ["hoist_constants"]


def hoist_constants(fn, *example_args):
    """Return (wrapped, consts, out_shape): wrapped(consts, *args) ==
    fn(*args).

    `consts` is a list of device arrays (the closed-over constants in
    trace order); pass the SAME list object to every call — the arrays
    live on device once (shared by reference with the closure and with
    other hoisted programs) and enter the compiled program as
    parameters, not literals.  `args` must match `example_args` in
    pytree structure and dtypes (the jaxpr is traced once, like jit);
    ShapeDtypeStructs are accepted.  `out_shape` is fn's output as a
    ShapeDtypeStruct pytree (an eval_shape, for free — tracing a
    mesh-sized program again just for shapes costs real host time).
    """
    closed_jaxpr, out_shape = jax.make_jaxpr(fn, return_shape=True)(
        *example_args)
    out_tree = jax.tree.structure(out_shape)
    consts = [jnp.asarray(c) for c in closed_jaxpr.consts]
    jaxpr = closed_jaxpr.jaxpr

    def wrapped(consts, *args):
        flat, _ = tree_flatten(args)
        out = core.eval_jaxpr(jaxpr, consts, *flat)
        return tree_unflatten(out_tree, out)

    return wrapped, consts, out_shape
