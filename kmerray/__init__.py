"""kmerray — Ray-Data-native k-mer feature-extraction engine.

Python surface mirrors the reference's pykmertools module
(/root/reference/pip/src/lib.rs:31-39); Dataset pipeline builders live
under kmerray.pipelines.*.
"""

from .api import (CgrComputer, KmerGenerator, KmerMinimiserGenerator,
                  MinimiserGenerator, OligoCgrComputer, OligoComputer,
                  run_cli, to_acgt, to_numeric)

__all__ = [
    "OligoComputer", "CgrComputer", "OligoCgrComputer", "KmerGenerator",
    "MinimiserGenerator", "KmerMinimiserGenerator", "to_acgt", "to_numeric",
    "run_cli",
]

__version__ = "0.1.0"
