"""Runtime: user contexts + compiled-task execution (reference L2-L4 bands)."""

from .context import (BfvContext, CkksBtpContext, CkksContext, FheContext,
                      create_context_for_params)
from .task import FheTask, FheTaskTpu

__all__ = ['BfvContext', 'CkksBtpContext', 'CkksContext', 'FheContext',
           'FheTask', 'FheTaskTpu', 'create_context_for_params']
