from .mesh import (DATA_AXIS, data_sharding, initialize_distributed,
                   make_mesh, process_allgather_detections, replicate,
                   replicated, shard_batch, sync_global_devices)
