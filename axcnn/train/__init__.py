from axcnn.train.losses import softmax_ce_loss, l2_regularization, kd_loss
from axcnn.train.schedules import make_lr_schedule
from axcnn.train.optimizer import momentum_init, momentum_update
from axcnn.train.ema import ema_init, ema_update
from axcnn.train.train_step import TrainState, create_train_state, make_train_step, make_eval_step
