"""Host IO: FASTA/FASTQ parsing and index serialization."""
