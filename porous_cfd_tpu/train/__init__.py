from porous_cfd_tpu.train.engine import (TrainState, make_train_functions,
                                         init_train_state)
