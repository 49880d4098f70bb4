from orbslam2_nmi_tpu.geometry import se3, camera  # noqa: F401
