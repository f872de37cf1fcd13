from .statevector import (StateVector, full_state_vector, state_vector_from_names, dof_names, to_tangent, apply_tangent, positions_of)  # noqa: F401
