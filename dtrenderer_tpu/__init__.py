"""dtrenderer_tpu — a TPU-native software rasterizer.

From-scratch rebuild of the capabilities of Doy-lee/DTRenderer (a handmade Win32/C++
CPU software rasterizer; see SURVEY.md) designed TPU-first: vertex transforms as batched
matmuls, triangle rasterization as tiled kernels over pixel blocks with in-register depth
tests, texture sampling as vectorized gathers, framebuffer tiles shardable across a JAX
device mesh. The op-order contract shared with the scalar CPU oracle lives in FORMULAS.md.
"""

__version__ = "0.1.0"
