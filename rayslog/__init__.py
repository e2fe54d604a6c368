"""rayslog — a Ray-Data-native syslog parse → enrich → route → aggregate engine.

Built from scratch against the behavior of ``jeromer/syslogparser`` v1.1.0
(reference at /root/reference, studied for semantics only — no code copied).

Layers:

- ``rayslog.kernels.oracle``      row-exact Python reimplementation of the
  reference's RFC3164/RFC5424 parsing automata (the parity anchor).
- ``rayslog.kernels.vectorized``  Arrow/RE2 fast-path kernels used inside
  ``map_batches``; rows the fast path can't prove equivalent fall back to
  the oracle.
- ``rayslog.stages``              Ray Data stages: parse, enrich (actor
  pool), route (partitioned sinks), aggregate (partial+combine), dedup,
  text analysis, ANN, multimodal stubs.
- ``rayslog.sources``             transcripts reader + deterministic
  synthetic transcript generator.
- ``rayslog.state``               per-partition lineage manifests,
  checkpoint/resume, metrics.
- ``rayslog.pipeline``            end-to-end wiring.

None of the library code calls ``ray.init`` / ``ray.shutdown``; sessions
are owned by bench.py / the CLI / the test fixture.
"""

from rayslog import _memtune
from rayslog.config import ParserConfig

_memtune.tune()

# NB: `use_polars_sort` was A/B-measured for the shuffle-heavy stages
# (global_sort 0.46->0.65s, conv_counts ~equal at sf0.1/32cpu) — a net
# loss; the default Arrow sort path stays.

__all__ = ["ParserConfig"]
__version__ = "0.1.0"
