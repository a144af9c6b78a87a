from porous_cfd_tpu.parallel.mesh import (initialize_distributed, make_mesh,
                                          shard_dataset_for_hosts)
