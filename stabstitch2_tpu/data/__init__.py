"""Dataset samplers and video IO (the reference's L3 layer)."""
