"""int8 W8A8 vs bf16 FFN throughput probe.

WARNING: int8 dot_general HANGS the tunneled (axon) remote compiler —
run only on directly-attached TPUs (docs/NOTES.md round-2/3 retests).

    PYTHONPATH=/root/repo python tools/bench_int8.py
"""
import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])
import time, jax, jax.numpy as jnp
from fairygen_tpu.ops.quant import quantize_dense_params, quantized_dense
key = jax.random.key(0)
S, D, F = 8192, 3072, 14336
x = jax.random.normal(key, (2, S, D), jnp.bfloat16)
p = {"w": jax.random.normal(key, (D, F), jnp.bfloat16) * 0.02}
qp = quantize_dense_params(p)
flops = 2 * 2 * S * D * F
def bench(name, f):
    g = jax.jit(lambda: jax.lax.fori_loop(0, 10, lambda i, a: a + f().astype(jnp.float32).sum()*0 + 1e-9, jnp.float32(0)))
    float(g()); t0=time.perf_counter(); float(g()); dt=(time.perf_counter()-t0)/10
    print(f"{name}: {dt*1e3:.2f} ms  {flops/dt/1e12:.0f} TF/s", flush=True)
bench("bf16 dense", lambda: jnp.dot(x, p["w"], preferred_element_type=jnp.float32).astype(jnp.bfloat16))
bench("int8 w8a8 ", lambda: quantized_dense(qp, x))
