"""Adversarial phase-2 resume restores the discriminator LR scheduler
state (sched_dis), not just the generator's — a mid-plateau interrupt
must not reset the D-LR reduction countdown."""

import json
import os

from tests.test_checkpoint_resume import _TripletLoader, _phase2_trainer


def test_sched_dis_state_persisted_and_restored(tmp_path):
    kw = dict(early_stop_patience=10, save_frequency=1)
    save_dir = str(tmp_path / "p2")

    part1 = _phase2_trainer()
    part1.fit(_TripletLoader(), _TripletLoader(seed=1), epochs=1,
              save_dir=save_dir, **kw)
    with open(os.path.join(save_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["sched_dis"] == part1.sched_dis.state_dict()
    assert meta["sched_dis"]["best"] != float("inf")

    # resume with epochs == start_epoch: the restore path runs but no
    # further epoch does, so the loaded state is directly observable
    part2 = _phase2_trainer()
    part2.fit(_TripletLoader(), _TripletLoader(seed=1), epochs=1,
              save_dir=save_dir, resume=True, **kw)
    assert part2.sched_dis.state_dict() == part1.sched_dis.state_dict()
    assert part2.sched.state_dict() == part1.sched.state_dict()
