"""Probabilistic sketch state objects.

Each class re-implements the update/query/merge semantics of one
structure from the reference library (Callidon/bloom-filters) with
numpy-backed storage and vectorized bulk operations, plus the
reference's JSON serialization field layout (``saveAsJSON``/``fromJSON``)
so sketch state can be checkpointed and exchanged as plain JSON.
"""

from .bitset import BitSet
from .bloom import BloomFilter
from .counting_bloom import CountingBloomFilter
from .partitioned_bloom import PartitionedBloomFilter
from .scalable_bloom import ScalableBloomFilter
from .minhash import MinHash, MinHashFactory, closest_prime, is_prime
from .cms import CountMinSketch
from .hyperloglog import HyperLogLog
from .topk import TopK, MinHeap
from .cuckoo import CuckooFilter, Bucket
from .xor_filter import XorFilter
from .iblt import InvertibleBloomFilter, Cell

__all__ = [
    "BitSet", "BloomFilter", "CountingBloomFilter", "PartitionedBloomFilter",
    "ScalableBloomFilter", "MinHash", "MinHashFactory", "closest_prime",
    "is_prime", "CountMinSketch", "HyperLogLog", "TopK", "MinHeap",
    "CuckooFilter", "Bucket", "XorFilter", "InvertibleBloomFilter", "Cell",
]
