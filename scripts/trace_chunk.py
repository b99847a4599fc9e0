"""Capture + summarize an op-level profile of one chunk on the TPU."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import numpy as np
import jax
import jax.numpy as jnp

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.data.synthetic import make_sequence
from slam_toolkit_tpu.pipeline.scan_engine import ChunkedSlamEngine

LOGDIR = "/tmp/jax_trace"

cfg = SlamConfig()
world, gt, frames = make_sequence(cfg, n_frames=24, seed=7, step=0.8)
chunks = [jnp.asarray(np.stack([np.stack([l, r]) for l, r in frames[i:i+8]]),
                      jnp.float32) for i in range(0, 24, 8)]
jax.block_until_ready(chunks)
eng = ChunkedSlamEngine(cfg, chunk_size=8)
eng.process_chunk(chunks[0])
eng.process_chunk(chunks[1])

jax.profiler.start_trace(LOGDIR)
eng.process_chunk(chunks[2])
jax.profiler.stop_trace()
print("trace captured")

# summarize: find the xplane file and print the top ops by self time
xplanes = glob.glob(LOGDIR + "/**/*.xplane.pb", recursive=True)
print("xplane files:", xplanes)
if xplanes:
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(xplanes, "framework_op_stats", {})
    out = "/tmp/op_stats.json"
    with open(out, "w") as f:
        f.write(data if isinstance(data, str) else data.decode())
    print("wrote", out)
