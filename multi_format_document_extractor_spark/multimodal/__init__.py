from .media import decode_image_stub, media_metadata  # noqa: F401
