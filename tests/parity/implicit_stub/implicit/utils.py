import numbers

import numpy as np


class ParameterWarning(UserWarning):
    pass


def check_random_state(random_state):
    if random_state is None or isinstance(random_state, numbers.Integral):
        return np.random.RandomState(random_state)
    if isinstance(random_state, np.random.RandomState):
        return random_state
    raise ValueError(f"cannot coerce {random_state} to a RandomState")
