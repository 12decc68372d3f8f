"""Web launcher/monitor (reference gradio_app.py parity, stdlib-only)."""

import json
import os
import threading
import time
import urllib.request

import pytest

from trinerflet_tpu.webapp import LaunchMonitor, make_server


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.read()


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


@pytest.fixture()
def server(tmp_path):
    cfgs = tmp_path / "configs"
    cfgs.mkdir()
    (cfgs / "a.yaml").write_text("name: a\n")
    mon = LaunchMonitor(configs_dir=str(cfgs))
    srv = make_server(mon, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], mon, tmp_path
    mon.stop()
    srv.shutdown()
    srv.server_close()


class TestWebApp:
    def test_page_and_configs(self, server):
        port, mon, _ = server
        page = _get(port, "/").decode()
        assert "a.yaml" in page and "launcher" in page
        assert json.loads(_get(port, "/configs")) == ["a.yaml"]

    def test_run_poll_artifact_stop(self, server):
        port, mon, tmp_path = server
        ws = str(tmp_path / "trial")
        # stand-in training process: logs, writes an image artifact, sleeps
        # (the handler path is identical for the real sr.launch/cli commands)
        # write the artifact atomically (tmp + rename) so the /artifact GET
        # can never observe a created-but-empty file under scheduler load
        mon_cmd = (
            "import os,sys,time; os.makedirs(sys.argv[1], exist_ok=True);"
            "print('step 1 loss 0.5', flush=True);"
            "p=os.path.join(sys.argv[1], 'val_0.png');"
            "open(p+'.tmp', 'wb').write(b'\\x89PNG fake');"
            "os.rename(p+'.tmp', p);"
            "time.sleep(60)"
        )
        import sys
        # drive through HTTP exactly as the page does, but point the command
        # at the stand-in by swapping Popen for the duration of the call
        import subprocess
        orig = subprocess.Popen
        calls = {}

        def fake_popen(cmd, **kw):
            calls["cmd"] = cmd
            return orig([sys.executable, "-c", mon_cmd, ws], **kw)

        saved, subprocess.Popen = subprocess.Popen, fake_popen
        try:
            out = _post(port, "/run", {"app": "sr", "config": "a.yaml",
                                       "workspace": ws, "extra": "k=v"})
        finally:
            subprocess.Popen = saved
        assert "pid" in out
        assert "trinerflet_tpu.sr.launch" in " ".join(calls["cmd"])
        assert "k=v" in calls["cmd"]

        deadline = time.time() + 20
        st = {}
        while time.time() < deadline:
            st = json.loads(_get(port, "/status"))
            if st.get("artifact") and "loss" in st.get("log", ""):
                break
            time.sleep(0.3)
        assert st["alive"] is True
        assert st["artifact"] == "val_0.png"
        assert "step 1 loss 0.5" in st["log"]
        assert _get(port, "/artifact").startswith(b"\x89PNG")

        # only one run at a time (reference keeps a single experiment slot)
        again = _post(port, "/run", {"app": "sr", "config": "a.yaml",
                                     "workspace": ws})
        assert "error" in again

        stopped = _post(port, "/stop", {})
        assert stopped["stopped"] is True
        st = json.loads(_get(port, "/status"))
        assert st["alive"] is False

    def test_recon_command_shape(self, server, monkeypatch):
        _, mon, tmp_path = server
        import subprocess
        captured = {}

        class FakeProc:
            pid = 123
            returncode = 0

            def poll(self):
                return 0

            def terminate(self):
                pass

            def wait(self, timeout=None):
                return 0

        def fake_popen(cmd, **kw):
            captured["cmd"] = cmd
            return FakeProc()

        monkeypatch.setattr(subprocess, "Popen", fake_popen)
        out = mon.start("recon", "", str(tmp_path / "w"),
                        "--path /tmp/scene -O --iters 10")
        assert out["pid"] == 123
        cmd = captured["cmd"]
        assert "trinerflet_tpu.cli" in cmd
        assert "--iters" in cmd and "-O" in cmd

    def test_unknown_app_rejected(self, server):
        _, mon, tmp_path = server
        assert "error" in mon.start("nope", "", str(tmp_path / "w2"), "")
