"""tpubwa — a TPU-native BWA-MEM-class read aligner.

A from-scratch re-design of cloud-scale-bwamem's capabilities for TPU:
Spark RDD data parallelism -> jax.shard_map over a device mesh; the broadcast
FM-index -> HBM-resident replicated/sharded arrays; the JNI batched
Smith-Waterman kernel -> Pallas wavefront kernels; HDFS I/O -> per-host files.
See SURVEY.md for the layer-by-layer mapping.

Import-time configuration (before any JAX computation):
  * 64-bit mode: genome coordinates exceed int32 past ~1 Gbp (GRCh38's
    bidirectional text is ~6.2e9), so x64 is enabled globally. All
    device arrays keep EXPLICIT dtypes — int32 wherever the value range
    allows (query coords, counts, codes), int64 only for text
    positions/ranks of large indices (see index.device.DeviceIndex.pos_dtype).
  * persistent compilation cache: device compile in this environment is
    remote and slow (tens of seconds to minutes); the cache cuts warm
    start to ~1s. Opt out with TPUBWA_NO_COMPILE_CACHE=1.
"""
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

if not _os.environ.get("TPUBWA_NO_COMPILE_CACHE"):
    _dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _os.path.join(
        _os.path.expanduser("~"), ".cache", "tpubwa", "jaxcache")
    _jax.config.update("jax_compilation_cache_dir", _dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from .opts import MemOptions, DEFAULT_OPTS

__version__ = "0.1.0"
