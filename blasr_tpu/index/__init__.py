from blasr_tpu.index.genome import GenomeIndex, SeqDB, build_genome_index  # noqa: F401
from blasr_tpu.index.suffix_array import build_suffix_array  # noqa: F401
