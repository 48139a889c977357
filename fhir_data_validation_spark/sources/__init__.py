from .iceberg_py import PyIcebergLineageStore, PyIcebergTable
from .synth import (dirty_token_table, sources_dim, stats_baseline,
                    token_table, vocab_dim)
from .tables import load_table, load_tables

__all__ = ["PyIcebergLineageStore", "PyIcebergTable", "dirty_token_table",
           "load_table", "load_tables", "sources_dim", "stats_baseline",
           "token_table", "vocab_dim"]
