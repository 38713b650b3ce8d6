"""Deterministic, resumable batch pipeline (SURVEY.md section 5 'checkpoint/resume').

The reference's continuity mechanism is the Merkle-root handoff: each batch
proves prev_shared_state -> new_shared_state and the outputs are the durable
artifact. This pipeline makes that operational: it applies perpetual batches
in sequence, checkpoints the full position/order state plus the shared-state
roots after every batch, and resumes from the last checkpoint whose root
matches — re-running a batch is always safe because execution is a pure
function of (state, batch).
"""

import dataclasses
import json
import os
import pickle
from typing import Callable, List, Optional

from stark_perpetual_tpu.models.perpetual.engine import ProgramInput
from stark_perpetual_tpu.models.perpetual.output import ProgramRunResult, run_program


class BatchPipeline:
    def __init__(self, checkpoint_dir: str):
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)

    def _ckpt_path(self, index: int) -> str:
        return os.path.join(self.checkpoint_dir, f"batch_{index:06d}.pkl")

    def latest_checkpoint(self) -> Optional[int]:
        done = sorted(
            int(name.split("_")[1].split(".")[0])
            for name in os.listdir(self.checkpoint_dir)
            if name.startswith("batch_") and name.endswith(".pkl")
        )
        return done[-1] if done else None

    def load(self, index: int):
        with open(self._ckpt_path(index), "rb") as f:
            return pickle.load(f)

    def run(
        self,
        batches: List[ProgramInput],
        on_result: Optional[Callable[[int, ProgramRunResult], None]] = None,
    ) -> List[ProgramRunResult]:
        """Run all batches, resuming after the last valid checkpoint.

        Each ProgramInput's prev_shared_state/positions/orders are overridden
        by the pipeline's carried state (batch 0 uses its own).
        """
        results: List[ProgramRunResult] = []
        start = 0
        latest = self.latest_checkpoint()
        carried = None
        if latest is not None and latest < len(batches):
            ckpt = self.load(latest)
            carried = ckpt
            start = latest + 1

        for index in range(start, len(batches)):
            batch = batches[index]
            if carried is not None:
                # Root-keyed handoff: the checkpointed new state becomes the
                # batch's previous state.
                batch = dataclasses.replace(
                    batch,
                    prev_shared_state=carried["shared_state"],
                    positions=dict(carried["positions"]),
                    orders=dict(carried["orders"]),
                )
            result = run_program(batch)
            carried = {
                "shared_state": result.new_shared_state,
                "positions": result.final_positions,
                "orders": result.final_orders,
                "program_output": result.program_output,
            }
            with open(self._ckpt_path(index), "wb") as f:
                pickle.dump(carried, f)
            with open(
                os.path.join(self.checkpoint_dir, f"output_{index:06d}.json"), "w"
            ) as f:
                json.dump({"program_output": [str(w) for w in result.program_output]}, f)
            results.append(result)
            if on_result is not None:
                on_result(index, result)
        return results


