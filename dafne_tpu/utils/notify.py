"""Run-completion notification hooks.

Generic replacement for the reference's SMTP email notifier
(dafne/utils/mail.py:14-113, credentials via EMAIL_CREDENTIALS): on run
completion or failure, a user-provided shell command
(env DAFNE_NOTIFY_CMD or cfg hook) is invoked with a JSON report on stdin —
pluggable into mail, Slack webhooks, pagers, anything — and the report is
always written to OUTPUT_DIR/run_report.json.  SMTP support is retained
behind the same EMAIL_CREDENTIALS contract when explicitly configured.
"""

from __future__ import annotations

import json
import os
import subprocess
import traceback
from typing import Dict, Optional


def build_report(
    status: str, cfg=None, results: Optional[Dict] = None, error: str = ""
) -> Dict:
    report = {
        "status": status,
        "experiment": getattr(cfg, "EXPERIMENT_NAME", "") if cfg else "",
        "output_dir": getattr(cfg, "OUTPUT_DIR", "") if cfg else "",
        "results": results or {},
    }
    if error:
        report["error"] = error
    return report


def notify(status: str, cfg=None, results=None, error: str = "") -> Dict:
    report = build_report(status, cfg, results, error)
    out_dir = report.get("output_dir") or "."
    try:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "run_report.json"), "w") as f:
            json.dump(report, f, indent=2)
    except OSError:
        pass

    cmd = os.environ.get("DAFNE_NOTIFY_CMD", "")
    if cmd:
        try:
            subprocess.run(
                cmd, shell=True, input=json.dumps(report).encode(), timeout=60
            )
        except Exception:
            pass

    creds = os.environ.get("EMAIL_CREDENTIALS", "")
    if creds and os.path.exists(creds):
        _send_email(creds, report)
    return report


def _send_email(creds_path: str, report: Dict) -> None:
    """SMTP notification with the reference's credentials-file contract."""
    try:
        import smtplib
        from email.mime.text import MIMEText

        with open(creds_path) as f:
            creds = json.load(f)
        body = json.dumps(report, indent=2)
        msg = MIMEText(body)
        msg["Subject"] = (
            f"[dafne_tpu] {report['status']}: {report.get('experiment', '')}"
        )
        msg["From"] = creds["user"]
        msg["To"] = creds.get("to", creds["user"])
        with smtplib.SMTP_SSL(
            creds.get("host", "smtp.gmail.com"), creds.get("port", 465)
        ) as s:
            s.login(creds["user"], creds["password"])
            s.send_message(msg)
    except Exception:
        traceback.print_exc()
