"""Raw irregular-series parsers (data/raw_irregular.py) vs the reference
semantics of mTAND/physionet.py and mTAND/person_activity.py.

The reference parse loops live inside torch-dependent download() methods
(they need torchvision + tarballs), so the oracle here is hand-computed
fixtures exercising every documented quirk: the all-zero t=0 bin, in-bin
running averages, consecutive-time binning, the 11->7 activity label
merge, tail-dropping window chunking, and the union-timeline collate.
"""

import numpy as np
import pytest

from raindrop_tpu.data.collate import variable_time_collate
from raindrop_tpu.data.raw_irregular import (
    ACTIVITY_LABEL_NAMES,
    PHYSIONET_PARAMS,
    parse_person_activity,
    parse_physionet_outcomes,
    parse_physionet_record,
    person_id,
    union_time_collate,
)

HR = PHYSIONET_PARAMS.index("HR")
GLU = PHYSIONET_PARAMS.index("Glucose")


def physionet_lines(rows):
    return ["Time,Parameter,Value\n"] + [f"{t},{p},{v}\n" for t, p, v in rows]


class TestPhysioNetParser:
    def test_zero_bin_and_hours(self):
        # reference physionet.py:148-151 — the record opens with an
        # all-zero t=0 bin even when the first observation is later.
        r = parse_physionet_record("p0", physionet_lines(
            [("01:30", "HR", "80")]), quantization=0.1)
        assert r.tt.tolist() == [0.0, 1.5]
        assert r.vals[0].sum() == 0 and r.mask[0].sum() == 0
        assert r.vals[1, HR] == 80.0 and r.mask[1, HR] == 1.0

    def test_in_bin_average(self):
        # two HR readings quantized into the same 0.1h bin -> running mean
        # (physionet.py:169-176); a different param lands in the same bin.
        r = parse_physionet_record("p0", physionet_lines([
            ("00:04", "HR", "80"), ("00:05", "HR", "90"),
            ("00:05", "Glucose", "100")]), quantization=0.1)
        assert r.tt == pytest.approx([0.0, 0.1])
        assert r.vals[1, HR] == pytest.approx(85.0)
        assert r.vals[1, GLU] == 100.0

    def test_reduce_overwrite(self):
        r = parse_physionet_record("p0", physionet_lines([
            ("00:04", "HR", "80"), ("00:05", "HR", "90")]),
            quantization=0.1, reduce="last")
        assert r.vals[1, HR] == 90.0

    def test_consecutive_binning_not_dict(self):
        # bins open on CHANGE of quantized time (physionet.py:161-167):
        # revisiting an earlier time makes a duplicate bin.
        r = parse_physionet_record("p0", physionet_lines([
            ("01:00", "HR", "80"), ("02:00", "HR", "90"),
            ("01:00", "HR", "70")]), quantization=0.1)
        assert r.tt.tolist() == [0.0, 1.0, 2.0, 1.0]
        assert r.vals[3, HR] == 70.0

    def test_record_id_line_ignored_unknown_raises(self):
        r = parse_physionet_record("p0", physionet_lines([
            ("00:00", "RecordID", "132539"), ("00:30", "HR", "80")]))
        assert r.mask.sum() == 1
        with pytest.raises(ValueError):
            parse_physionet_record("p0", physionet_lines([
                ("00:00", "NotAParam", "1")]))

    def test_outcomes(self):
        out = parse_physionet_outcomes([
            "RecordID,SAPS-I,SOFA,Length_of_stay,Survival,In-hospital_death\n",
            "132539,6,1,5,-1,0\n", "132540,16,8,8,-1,1\n"])
        assert out["132539"][4] == 0 and out["132540"][4] == 1

    def test_feeds_shared_collate(self):
        recs = [parse_physionet_record("a", physionet_lines(
                    [("00:30", "HR", "80"), ("01:00", "Glucose", "120")])),
                parse_physionet_record("b", physionet_lines(
                    [("00:30", "HR", "60")]))]
        recs = [r._replace(label=i) for i, r in enumerate(recs)]
        combined, labels = variable_time_collate(recs)
        D = len(PHYSIONET_PARAMS)
        assert combined.shape == (2, 3, 2 * D + 1)
        assert labels.tolist() == [0, 1]
        # min-max rule (x - min) / max: HR min 60 max 80 -> (80-60)/80
        assert combined[0, 1, HR] == pytest.approx((80 - 60) / 80)


class TestRealOutcomes:
    """The reference ships the real challenge-2012 Outcomes-{a,b,c}.txt
    (P12data/rawdata/) — parse them for real-artifact coverage."""

    def test_outcomes_a(self):
        import os
        path = "/root/reference/P12data/rawdata/Outcomes-a.txt"
        if not os.path.exists(path):
            pytest.skip("reference raw outcomes not present")
        with open(path) as f:
            out = parse_physionet_outcomes(f)
        assert len(out) == 4000
        assert all(v.shape == (5,) for v in out.values())
        mortality = np.array([v[4] for v in out.values()])
        assert set(np.unique(mortality)) == {0.0, 1.0}
        # challenge-2012 set-a in-hospital mortality is ~13.9%
        assert 0.10 < mortality.mean() < 0.18


def activity_line(rid, tag, t, v, label):
    return f"{rid},{tag},{t},27.05.2009 14:03:25:323,{v},{v},{v},{label}\n"


TAGS = ["010-000-024-033", "010-000-030-096",
        "020-000-033-111", "020-000-032-221"]


class TestPersonActivityParser:
    def make_lines(self, rid="A01", n_bins=120, tag_cycle=TAGS):
        # one observation per 100ms bin, cycling through the tags
        lines = []
        for i in range(n_bins):
            tag = tag_cycle[i % len(tag_cycle)]
            label = "walking" if i % 2 == 0 else "sitting"
            lines.append(activity_line(rid, tag, i * 10 ** 5, float(i), label))
        return lines

    def test_chunking_drops_tail(self):
        # 120 bins, window 50, stride 25: offsets 0,25,50 satisfy
        # offset+50 < 120 -> 3 chunks; <=50 bins -> no chunks at all
        # (person_activity.py:101-112).
        recs = parse_person_activity(self.make_lines(n_bins=120))
        assert len(recs) == 3
        assert all(r[1].shape == (50,) for r in recs)
        assert parse_person_activity(self.make_lines(n_bins=40)) == []

    def test_chunk_times_rebased_and_features_flat(self):
        recs = parse_person_activity(self.make_lines(n_bins=120))
        _rid, tt, vals, mask, labels = recs[1]
        assert tt[0] == 0.0                      # tt[idx] - tt[idx][0]
        assert vals.shape == (50, 12) and mask.shape == (50, 12)
        assert labels.shape == (50, len(ACTIVITY_LABEL_NAMES))
        # chunk 1 starts at bin 25 -> tag 25 % 4 == 1, value 25.0 x3
        assert vals[0, 3:6].tolist() == [25.0, 25.0, 25.0]
        assert mask[0, 3:6].tolist() == [1.0, 1.0, 1.0]

    def test_label_merge_11_to_7(self):
        # "lying down" and "lying" merge into index 2; "sitting down" -> 3
        # (person_activity.py:41-54); the vector stays 11 wide.
        lines = []
        for i, lab in enumerate(["lying down", "lying", "sitting down"] * 40):
            lines.append(activity_line("A01", TAGS[i % 4], i * 10 ** 5,
                                       1.0, lab))
        recs = parse_person_activity(lines)
        labels = recs[0][4]
        assert labels.shape[1] == 11
        assert set(np.nonzero(labels.sum(0))[0].tolist()) == {2, 3}

    def test_in_bin_average_per_tag(self):
        # two observations of one tag in one bin average elementwise
        lines = [activity_line("A01", TAGS[0], 0, 1.0, "walking"),
                 activity_line("A01", TAGS[0], 10, 3.0, "walking")]
        # pad with enough later bins to emit a chunk
        for i in range(1, 130):
            lines.append(activity_line("A01", TAGS[1], i * 10 ** 5, 0.5,
                                       "walking"))
        recs = parse_person_activity(lines)
        vals = recs[0][2]
        assert vals[0, 0:3].tolist() == [2.0, 2.0, 2.0]

    def test_multiple_records_split_and_person_id(self):
        lines = self.make_lines("A01", 120) + self.make_lines("B02", 120)
        recs = parse_person_activity(lines)
        assert {r[0] for r in recs} == {"A01", "B02"}
        assert person_id("A01") == 0 and person_id("C07") == 2

    def test_union_time_collate(self):
        recs = parse_person_activity(
            self.make_lines("A01", 120) + self.make_lines("B02", 180))
        out = union_time_collate(recs)
        B = len(recs)
        L = out["time_steps"].shape[0]
        assert out["data"].shape == (B, L, 12)
        assert out["mask"].shape == (B, L, 12)
        assert out["labels"].shape == (B, L, 11)
        # times normalized to [0, 1] by the batch max
        assert out["time_steps"].max() == pytest.approx(1.0)
        assert (np.diff(out["time_steps"]) > 0).all()
        # every record's observations landed somewhere
        assert out["mask"].sum() == sum(r[3].sum() for r in recs)


def test_acquire_physionet_zero_egress_contract(tmp_path):
    """The acquisition layer (reference physionet.py:104-233) is a
    documented manual step here: download=True names the URL manifest,
    an empty root raises FileNotFoundError with the manifest, and an
    extracted set-a/ layout parses through load_physionet_dir."""
    from raindrop_tpu.data.raw_irregular import (
        PHYSIONET_URLS, acquire_physionet)

    with pytest.raises(RuntimeError, match="zero-egress"):
        acquire_physionet(str(tmp_path), download=True)
    with pytest.raises(FileNotFoundError, match="set-a"):
        acquire_physionet(str(tmp_path))
    assert all(u.startswith("https://physionet.org/") for u in PHYSIONET_URLS)

    seta = tmp_path / "set-a"
    seta.mkdir()
    (seta / "132539.txt").write_text(
        "Time,Parameter,Value\n00:00,RecordID,132539\n00:00,Age,54\n"
        "00:07,HR,73\n01:30,HR,80\n")
    (tmp_path / "Outcomes-a.txt").write_text(
        "RecordID,SAPS-I,SOFA,Length_of_stay,Survival,In-hospital_death\n"
        "132539,6,1,5,-1,0\n")
    out = acquire_physionet(str(tmp_path))
    assert set(out) == {"set-a"}
    rec = out["set-a"][0]
    assert rec.record_id == "132539" and rec.label == 0
