"""A/B the headline decode+D2H chunk size (VERDICT r4 #7).

decode_to_host overlaps each chunk's D2H with the next chunk's decode, but
every transfer pays the axon link's ~0.2-0.3 s per-transfer latency — so
chunk=4 (4 transfers) may lose to chunk=8 (2) or 16 (1, no overlap) on this
link. Measures the full decode_to_host for T=16 at 768^2, bf16 SD decoder.

Run: python probes/_decode_chunk_ab.py   (real chip)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import bench
from mikudance_tpu.models.vae import Decoder
from mikudance_tpu.pipelines.video import ModelBundle, VideoPipeline

bundle = bench.build_bundle()
rng = np.random.default_rng(0)
T = 16
lat = jnp.asarray(rng.normal(0, 1, (T, bench.h, bench.w, 4)).astype(np.float32))

for chunk in (4, 8, 16):
    dec = Decoder(dtype=bench.DTYPE, decode_chunk=chunk)
    b2 = ModelBundle(bundle.guide, bundle.guide_params, bundle.den,
                     bundle.den_params, bundle.vae_enc, bundle.vae_enc_params,
                     dec, bundle.vae_dec_params)
    pipe = VideoPipeline(b2)
    pipe.decode_to_host(lat)  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = pipe.decode_to_host(lat)
        times.append(time.perf_counter() - t0)
    assert out.shape == (T, bench.H, bench.W, 3)
    print(f"chunk={chunk:3d}: best {min(times):.3f} s  median "
          f"{sorted(times)[1]:.3f} s", flush=True)
