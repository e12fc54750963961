"""Device (JAX/XLA/Pallas) kernels for the batchable hot loops.

The codec's parallel axes map onto the TPU as:
- blocks  -> data parallelism over the mesh (kanzi_tpu.parallel)
- chunks  -> batch dimension inside a chip
- the reference's 4/8-way interleaved lanes -> the vector dimension

Kernels here compute byte-identical payloads to the C++ host engines (the
tests assert it), so either engine can feed the KANZ container.
"""
