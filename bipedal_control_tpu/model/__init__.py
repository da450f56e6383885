from .urdf import RobotDescription, build_reduced_model, load_urdf
from .robot_model import RobotModel, from_description
from .kinematics import (
    BodyKin,
    forward_kinematics,
    frame_jacobian,
    frame_jacobian_dot,
    frame_position,
    frame_transform,
    frame_velocity,
    com_position,
    point_jacobian,
)
from .dynamics import (
    forward_dynamics,
    gravity_vector,
    inverse_dynamics,
    kinetic_energy,
    mass_matrix,
    nonlinear_effects,
    potential_energy,
)
from .centroidal import (
    CentroidalModelInfo,
    base_kinematics_from_centroidal,
    centroidal_flow_map,
    centroidal_momentum_matrix,
    centroidal_momentum_matrix_dot,
    centroidal_state_from_rbd,
    contact_positions,
    generalized_velocity_from_state_input,
    make_info,
    normalized_momentum_rate,
    rbd_state_from_centroidal,
)
