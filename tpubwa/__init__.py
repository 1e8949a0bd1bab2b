"""tpubwa — a TPU-native BWA-MEM-class read aligner.

A from-scratch re-design of cloud-scale-bwamem's capabilities for TPU:
Spark RDD data parallelism -> jax.shard_map over a device mesh; the broadcast
FM-index -> HBM-resident replicated/sharded arrays; the JNI batched
Smith-Waterman kernel -> Pallas wavefront kernels; HDFS I/O -> per-host files.
See SURVEY.md for the layer-by-layer mapping.
"""
from .opts import MemOptions, DEFAULT_OPTS

__version__ = "0.1.0"
