from reseek_tpu.encoder.dss import DSSEncoding, encode_chain, mu_kmers

__all__ = ["DSSEncoding", "encode_chain", "mu_kmers"]
