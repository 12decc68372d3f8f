"""NeRF super-resolution application (TriNeRFLet SR).

TPU-native counterpart of the reference ``super_resolution/`` threestudio fork:
fit a wavelet triplane on low-res views, then exploit the fact that the same
wavelet parameters decode to a higher-resolution triplane ("double resolution
mode") and refine high-res renders with a diffusion x4-upscaler into cached
pseudo-ground-truth images that are re-fit with L1/L2 + consistency losses.
"""
