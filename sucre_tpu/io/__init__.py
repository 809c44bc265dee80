"""Host-side I/O: COLMAP model ingest, image/depth decode, prefetch."""

from sucre_tpu.io.colmap import (  # noqa: F401
    CAMERA_MODELS,
    ColmapCamera,
    ColmapImage,
    ColmapPoint3D,
    read_model,
    read_cameras_bin,
    read_cameras_txt,
    read_images_bin,
    read_images_txt,
    read_points3D_bin,
    read_points3D_txt,
    write_cameras_bin,
    write_images_bin,
    write_points3D_bin,
    write_cameras_txt,
    write_images_txt,
    write_points3D_txt,
)
