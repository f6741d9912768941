"""Host->device transfer characterization on the relay-attached chip:
bandwidth vs latency, dtype scaling, and compute overlap."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def t_put(x, reps=8):
    jax.block_until_ready(jax.device_put(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(jax.device_put(x))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    for mb in (0.1, 0.4, 1.6, 6.4, 25.6):
        n = int(mb * 1e6 / 4)
        x = np.random.randn(n).astype(np.float32)
        ms = t_put(x)
        print(f"f32 {mb:6.1f} MB  {ms:8.2f} ms   {mb / ms * 1000:8.1f} MB/s",
              flush=True)
    x16 = np.random.randint(-1000, 1000, int(6.4e6 / 2), dtype=np.int16)
    ms = t_put(x16)
    print(f"i16 {6.4:6.1f} MB  {ms:8.2f} ms   {6.4 / ms * 1000:8.1f} MB/s")

    # overlap test: dispatch a long matmul chain, then device_put while busy
    a = jnp.asarray(np.random.randn(4096, 4096).astype(np.float32))

    @jax.jit
    def burn(a):
        def body(c, _):
            return jnp.tanh(c @ a) * 1e-3, None
        c, _ = jax.lax.scan(body, a, None, length=60)
        return c

    out = burn(a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = burn(a)
    jax.block_until_ready(out)
    t_burn = (time.perf_counter() - t0) * 1e3
    print(f"burn alone {t_burn:8.2f} ms", flush=True)

    big = np.random.randn(int(6.4e6 / 4)).astype(np.float32)
    t0 = time.perf_counter()
    out = burn(a)
    d = jax.device_put(big)
    jax.block_until_ready((out, d))
    t_both = (time.perf_counter() - t0) * 1e3
    print(f"burn + 6.4MB put overlapped {t_both:8.2f} ms "
          f"(sum would be {t_burn + t_put(big):.2f})")


if __name__ == "__main__":
    main()
