"""L2 — reference-mix generators."""

from diffmst_tpu.mixing.naive import NaiveRandomMix, naive_random_mix

__all__ = ["NaiveRandomMix", "naive_random_mix"]
