"""Probe: reconcile the synthetic erf-peak kernel with the production
kernel's implied erf rate (scripts/efficiency.py showed production at 199%
of "peak", which means the peak kernel mis-measures). Variants:

  A. original: acc += erf(x - j*eps)      (loop-invariant args — hoistable?)
  B. carry-tied: args depend on acc       (nothing hoistable)
  C. production kernel at full capacity, exact work model
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgrt_tpu.ops.approx import erf_as5

SHAPE = (512, 512)
UNROLL = 16
STEPS = 16
ELEMS = SHAPE[0] * SHAPE[1] * UNROLL * STEPS


def fetch_time(f, n_iter=10):
    r = f()
    float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        r = f()
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / n_iter


def run(body):
    def kern(x_ref, o_ref):
        x = x_ref[...]

        def step(_, acc):
            return body(acc, x)

        o_ref[...] = jax.lax.fori_loop(0, STEPS, step, jnp.zeros_like(x))

    x = jnp.asarray(np.random.default_rng(0).uniform(-1, -0.01, SHAPE),
                    jnp.float32)
    f = jax.jit(pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        interpret=jax.default_backend() != "tpu"))
    return fetch_time(lambda: f(x))


def a_body(acc, x):
    for j in range(UNROLL):
        acc = acc + erf_as5(x - j * 0.001)
    return acc


def b_body(acc, x):
    y = x + acc * 1e-30
    out = acc
    for j in range(UNROLL):
        out = out + erf_as5(y - j * 0.001)
    return out


t = run(a_body)
print(f"A original      : {ELEMS / t / 1e9:.1f} Gerf/s  ({t*1e3:.2f} ms)")
t = run(b_body)
print(f"B carry-tied    : {ELEMS / t / 1e9:.1f} Gerf/s  ({t*1e3:.2f} ms)")


# C: production fused fwd kernel, full capacity, exact model
from sgrt_tpu.ops.pallas_kernel import render_fused

b, n, r = 8, 512, 1024
rng = np.random.default_rng(1)
oc = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
sig = jnp.asarray(rng.uniform(0.5, 1.0, (b, n)), jnp.float32)
mag = jnp.ones((b, n), jnp.float32) * 0.01
alb = jnp.asarray(rng.uniform(0, 1, (b, n, 3)), jnp.float32)
dirs = jnp.asarray(rng.normal(size=(b, 3, r)), jnp.float32)

f = jax.jit(functools.partial(render_fused, rb=128, pb=16, qb=32))
t = fetch_time(lambda: f(oc, sig, mag, alb, dirs)[0], n_iter=5)
work = b * r * (n * n * 5 + n)  # 5-tap p/q area + base pass
print(f"C production fwd: {work / t / 1e9:.1f} Gerf/s  ({t*1e3:.2f} ms, "
      f"work {work/1e9:.2f} G)")

# C2: bigger blocks
f = jax.jit(functools.partial(render_fused, rb=128, pb=64, qb=128))
t = fetch_time(lambda: f(oc, sig, mag, alb, dirs)[0], n_iter=5)
print(f"C2 prod pb64qb128: {work / t / 1e9:.1f} Gerf/s  ({t*1e3:.2f} ms)")
