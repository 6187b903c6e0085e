from utree_tpu.io.fasta import read_linearized_fasta, iter_fasta_records
from utree_tpu.io.maps import read_tax_map

__all__ = ["read_linearized_fasta", "iter_fasta_records", "read_tax_map"]
