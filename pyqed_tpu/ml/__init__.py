from .nn import MLP, init_params, forward, mse
