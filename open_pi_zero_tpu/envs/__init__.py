"""In-repo kinematic environments for closed-loop evaluation.

SimplerEnv/SAPIEN cannot be installed in every deployment (and not in this
sandbox); these environments speak the exact observation/step protocol the
real Simpler tasks do (reference src/agent/eval.py:60-179), so the full
EvalAgent + env-adapter + policy stack can be exercised — and a policy
*trained end-to-end* through the production data pipeline can be scored on
a closed-loop success rate, the reference's acceptance metric
(reference README.md:90-114).
"""

from open_pi_zero_tpu.envs.reach_env import (  # noqa: F401
    INSTRUCTIONS,
    ReachEnv,
    bridge_proprio,
    collect_demos,
    scripted_expert,
    warm_tokenizer,
    write_demo_dataset,
)
