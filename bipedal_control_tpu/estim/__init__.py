from .cheater import rbd_state_from_ground_truth
from .kalman import KalmanConfig, KalmanState, kalman_init, kalman_update
