"""Capture + summarize an op-level profile of bench chunks on the TPU.

Uses the bench.py frame cache (run bench.py once to build it). Traces
two mid-sequence chunks — a warm map with the production keyframe rate.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.pipeline.scan_engine import ChunkedSlamEngine

LOGDIR = "/tmp/jax_trace"
CHUNK = 16

cfg = SlamConfig()
cache = (f"/tmp/slam_bench_seq_v2_160_{cfg.camera.width}x"
         f"{cfg.camera.height}.npz.npy")
stacked = np.load(cache, mmap_mode="r")
chunks = [jnp.asarray(stacked[i:i + CHUNK], jnp.float32)
          for i in range(0, 160, CHUNK)]
jax.block_until_ready(chunks)
eng = ChunkedSlamEngine(cfg, chunk_size=CHUNK)
for c in chunks[:6]:
    eng.process_chunk(c)
eng.flush()

jax.profiler.start_trace(LOGDIR)
eng.process_chunk(chunks[6])
eng.process_chunk(chunks[7])
eng.flush()
jax.profiler.stop_trace()
print("trace captured")

xplanes = glob.glob(LOGDIR + "/**/*.xplane.pb", recursive=True)
xplanes.sort(key=os.path.getmtime)
print("xplane files:", xplanes[-1:])
if xplanes:
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(xplanes[-1:], "framework_op_stats", {})
    out = "/tmp/op_stats.json"
    with open(out, "w") as f:
        f.write(data if isinstance(data, str) else data.decode())
    print("wrote", out)
