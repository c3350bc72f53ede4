from open_pi_zero_tpu.models import joint, mixture, pizero, siglip

__all__ = ["siglip", "mixture", "joint", "pizero"]
