"""Parse stage: detect + parse every turn's text, as a Ray Data transform.

Stateless ``map_batches`` tasks over zero-copy Arrow batches — the parse
automaton holds no cross-row state (reference §3.4: all parser state dies
with the message), so an actor pool would only add overhead.
"""

from __future__ import annotations

import pyarrow as pa

from rayslog.config import DEFAULT_CONFIG, ParserConfig
from rayslog.kernels.vectorized import parse_batch

#: Parse batches default to WHOLE BLOCKS (batch_size=None): re-slicing
#: blocks into fixed-size batches costs a copy per batch and halves
#: pipeline throughput (measured 2.2s vs 3.5s for 9.6M rows at 32 CPUs).
#: Block granularity is controlled at the source (input files / row
#: groups / target_max_block_size), which is where it belongs.
PARSE_BATCH_SIZE = None


def make_parse_fn(cfg: ParserConfig = DEFAULT_CONFIG, text_col: str = "text"):
    """A picklable batch function closing over a frozen ParserConfig."""

    def parse(batch: pa.Table) -> pa.Table:
        return parse_batch(batch, cfg, text_col=text_col)

    return parse


def parse_dataset(
    ds,
    cfg: ParserConfig = DEFAULT_CONFIG,
    text_col: str = "text",
    batch_size: int | None = PARSE_BATCH_SIZE,
):
    """ds.map_batches(parse) with Arrow zero-copy in/out."""
    return ds.map_batches(
        make_parse_fn(cfg, text_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
