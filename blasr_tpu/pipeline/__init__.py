from blasr_tpu.pipeline.map_read import DeviceIndex, Mapper, map_batch  # noqa: F401
