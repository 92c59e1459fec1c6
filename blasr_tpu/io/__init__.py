from blasr_tpu.io.fasta import (  # noqa: F401
    FastaRecord,
    read_fasta,
    read_fastq,
    read_sequences,
    write_fasta,
)
