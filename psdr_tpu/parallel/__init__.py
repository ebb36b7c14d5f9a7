from .sharding import (device_mesh, shard_render_fn, make_train_step,
                       make_multiview_train_step, replicate_scene_params,
                       initialize_distributed)
