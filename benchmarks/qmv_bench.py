import sys; sys.path.insert(0, "/root/repo")
import time, sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl

K, N = 4096, 11008
rs = np.random.RandomState(0)
w = jnp.asarray(rs.randn(K, N).astype(np.float32) * 0.02)
x = jnp.asarray(rs.randn(1, K).astype(np.float32)).astype(jnp.bfloat16)
from instructany2pix_tpu.ops import quant as Q
q8 = Q.quantize_weight(w); q4 = Q.quantize_weight_int4(w)

def bench(fn, q, iters=100):
    @jax.jit
    def loop(x, q):
        def body(i, carry):
            o = fn(carry, q)
            return (carry + 1e-7 * jnp.sum(o).astype(carry.dtype)).astype(carry.dtype)
        return jax.lax.fori_loop(0, iters, body, x)
    r = loop(x, q); float(jnp.sum(r))
    t0 = time.perf_counter(); r = loop(x, q); float(jnp.sum(r)); t1 = time.perf_counter()
    return (t1 - t0) / iters * 1e6

which = sys.argv[1]
if which == "base":
    print(f"int8 cur {bench(Q.pallas_qmatmul, q8):.1f}us")
    print(f"int4 cur {bench(Q.pallas_qmatmul, q4):.1f}us")
    print(f"floors: int8 {K*N/819e9*1e6:.1f} int4 {K*N/2/819e9*1e6:.1f}us")
elif which == "mixed":
    def _kern8(x_ref, w_ref, s_ref, o_ref):
        acc = jax.lax.dot_general(x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[:] = (acc * s_ref[0][None]).astype(o_ref.dtype)
    def mixed8(x, q, block_n=512):
        n = q["w_q"].shape[1]
        sc = q["scale"].reshape(1, -1).astype(jnp.float32)
        return pl.pallas_call(_kern8, grid=(n // block_n,),
            in_specs=[pl.BlockSpec((1, K), lambda i: (0, 0)),
                      pl.BlockSpec((K, block_n), lambda i: (0, i)),
                      pl.BlockSpec((1, block_n), lambda i: (0, i))],
            out_specs=pl.BlockSpec((1, block_n), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((1, n), x.dtype))(x, q["w_q"], sc)
    ref = Q.pallas_qmatmul(x, q8); got = mixed8(x, q8)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"mixed8 {bench(mixed8, q8):.1f}us maxerr {err:.2e}")
elif which == "mixed4":
    def _kern4(x_ref, w_ref, s_ref, o_ref):
        wp = w_ref[:]
        lo = jnp.right_shift(jnp.left_shift(wp, 4), 4)
        hi = jnp.right_shift(wp, 4)
        wu = jnp.concatenate([lo, hi], axis=0)
        acc = jax.lax.dot_general(x_ref[:], wu, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[:] = (acc * s_ref[0][None]).astype(o_ref.dtype)
    def mixed4(x, q, block_n=512):
        n = q["w_q4"].shape[1]
        sc = q["scale"].reshape(1, -1).astype(jnp.float32)
        return pl.pallas_call(_kern4, grid=(n // block_n,),
            in_specs=[pl.BlockSpec((1, K), lambda i: (0, 0)),
                      pl.BlockSpec((K // 2, block_n), lambda i: (0, i)),
                      pl.BlockSpec((1, block_n), lambda i: (0, i))],
            out_specs=pl.BlockSpec((1, block_n), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((1, n), x.dtype))(x, q["w_q4"], sc)
    ref = Q.pallas_qmatmul(x, q4); got = mixed4(x, q4)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"mixed4 {bench(mixed4, q4):.1f}us maxerr {err:.2e}")
