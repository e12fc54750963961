from .compressed_stream import Writer, Reader, compress_block_payload  # noqa: F401
