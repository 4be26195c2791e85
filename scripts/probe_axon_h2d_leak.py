#!/usr/bin/env python
"""Probe: does device_put leak host RSS on this backend?  (Round-5 finding:
the axon tunnel client retains ~1 MB host RSS per ~1 MB H2D transfer, del or
not — the root cause of the GAN long-run OOM at ~60k steps; GAN_LONGRUN.md.)"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

def rss():
    return int(open(f"/proc/{os.getpid()}/status").read().split("VmRSS:")[1].split()[0])

x = np.random.default_rng(0).standard_normal((16, 16080)).astype(np.float32)  # ~1 MB
f = jax.jit(lambda a: a.sum())
print("backend:", jax.default_backend())
r0 = rss()
for i in range(300):
    d = jax.device_put(x)
    s = f(d)
    del d, s
print("device_put+jit 300 iters, ~1MB each: RSS delta", rss() - r0, "kB")

r0 = rss()
for i in range(300):
    d = jax.device_put(x)
    del d
print("device_put only   300 iters: RSS delta", rss() - r0, "kB")
