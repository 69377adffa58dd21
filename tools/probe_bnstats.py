"""Microbench: what bounds the BN batch-statistics fusions?

The round-5 trace attribution (RESULTS.md) shows the flagship step's
largest bucket (39% of device time) is XLA's `convert_reduce_fusion.*` —
each computes a conv activation's BN batch statistics (f32 sum/sum²
over N,H,W keeping C) AND materializes the bf16 activation in the next
conv's preferred layout, at ~45% of HBM bandwidth. This probe measures
the pieces standalone at the dominant shape to name what the other 55%
is:

  a) pure stat reduce  (read act once -> f32[C] mean/var)
  b) stat reduce + bf16 copy-out (what the fusion does, minus the
     layout change)
  c) stat reduce + TRANSPOSED copy-out (layout {3,0,2,1}-ish: move the
     lane dim) — the fusion's actual work
  d) plain transpose alone

If (a) runs near the 1-read byte floor and (c) matches the in-step
fusion's rate, the 45% number is the price of the layout-moving copy
fused into the reduce — i.e. the envelope is set by the transpose the
next conv wants, not by the reduction: a custom kernel computing stats
alone could not remove the copy, so the in-step fusion is already the
right trade. Run:  python tools/probe_bnstats.py
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import bench

    dev = jax.devices()[0]
    bw = bench._hbm_bw(dev) or 819e9

    N, H, W, C = 144, 128, 128, 96
    nbytes = N * H * W * C * 2  # bf16
    x = jax.random.normal(jax.random.PRNGKey(0), (N, H, W, C),
                          jnp.bfloat16)
    iters = 50

    def timed(name, fn, traffic):
        @jax.jit
        def run(x):
            def body(c, _):
                out = fn(x + c.astype(x.dtype))
                # fold every output into the carry so nothing is DCE'd
                s = sum(jnp.sum(o.astype(jnp.float32))
                        for o in jax.tree_util.tree_leaves(out))
                return s * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c
        compiled = run.lower(x).compile()
        float(compiled(x))
        t0 = time.time()
        float(compiled(x))
        dt = (time.time() - t0) / iters
        floor = traffic / bw
        print(f"{name:34s} {dt*1e3:7.3f} ms   floor {floor*1e3:6.3f} ms "
              f"  {100*floor/dt:5.1f}% of BW  ({traffic/1e9:.2f} GB)")
        return dt

    def stats(x):
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf, axis=(0, 1, 2))
        v = jnp.mean(xf * xf, axis=(0, 1, 2)) - m * m
        return m, v

    print(f"shape ({N},{H},{W},{C}) bf16 = {nbytes/1e9:.2f} GB, "
          f"HBM {bw/1e9:.0f} GB/s, {iters} iters/scan")
    timed("a) stats only (1 read)", stats, nbytes)
    timed("b) stats + bf16 copy-out",
          lambda x: stats(x) + (x * jnp.bfloat16(1.0000001),),
          2 * nbytes)
    timed("c) stats + transposed copy-out",
          lambda x: stats(x) + (jnp.transpose(
              x * jnp.bfloat16(1.0000001), (3, 0, 2, 1)),),
          2 * nbytes)
    timed("d) transpose alone",
          lambda x: (jnp.transpose(x, (3, 0, 2, 1)),), 2 * nbytes)
    # the in-step fusion reference point (RESULTS.md r5): 2.43 ms at this
    # shape inside the compiled step = ~45% of BW for 2x traffic
    print("in-step convert_reduce_fusion.370 (trace): 2.427 ms")


def producer_variant():
    """e) conv producer -> stats + transposed copy in ONE program: does
    the fusion slow to its in-step rate when its input is a conv's
    output (conv-chosen layout) rather than a parameter-layout array?"""
    import jax
    import jax.numpy as jnp
    import bench
    dev = jax.devices()[0]
    bw = bench._hbm_bw(dev) or 819e9
    N, H, W, Ci, Co = 144, 128, 128, 16, 96
    x = jax.random.normal(jax.random.PRNGKey(1), (N, H, W, Ci),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(2), (1, 1, Ci, Co),
                          jnp.bfloat16)
    iters = 50
    act_bytes = N * H * W * Co * 2
    in_bytes = N * H * W * Ci * 2

    def fn(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        yb = y.astype(jnp.bfloat16)
        m = jnp.mean(y, axis=(0, 1, 2))
        v = jnp.mean(y * y, axis=(0, 1, 2)) - m * m
        return m, v, jnp.transpose(yb, (3, 0, 2, 1))

    @jax.jit
    def run(x, w):
        def body(c, _):
            m, v, t = fn(x + c.astype(x.dtype), w)
            s = (jnp.sum(m) + jnp.sum(v) +
                 jnp.sum(t.astype(jnp.float32)))
            return s * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    import time
    compiled = run.lower(x, w).compile()
    float(compiled(x, w))
    t0 = time.time()
    float(compiled(x, w))
    dt = (time.time() - t0) / iters
    # floor: read x, write act (fused stats read it in-register), read
    # nothing else big; + write transposed copy
    floor = (in_bytes + 2 * act_bytes) / bw
    print(f"e) conv -> stats+transposed copy   {dt*1e3:7.3f} ms   "
          f"floor {floor*1e3:6.3f} ms   {100*floor/dt:5.1f}% of BW")


if __name__ == "__main__":
    if "--producer" in sys.argv:
        producer_variant()
    else:
        main()
