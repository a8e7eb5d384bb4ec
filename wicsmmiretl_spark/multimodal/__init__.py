from wicsmmiretl_spark.multimodal.images import (
    RawGrid,
    ResizeTransformation,
    CompressTransformation,
    WebPTransformation,
    apply_image_transformations,
    decode_image_metadata,
    fetch_images,
    transformations_from_config,
)

__all__ = [
    "RawGrid",
    "ResizeTransformation",
    "CompressTransformation",
    "WebPTransformation",
    "apply_image_transformations",
    "decode_image_metadata",
    "fetch_images",
    "transformations_from_config",
]
