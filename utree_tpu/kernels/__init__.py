from utree_tpu.kernels.lookup_pallas import pallas_lookup_kmers

__all__ = ["pallas_lookup_kmers"]
