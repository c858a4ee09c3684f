"""Engine constants derived from the reference's operational envelope.

Every constant cites the reference file:line it reproduces
(see /root/reference, iAstronaut/Kinesis-Stream-Video-Project).
"""

# Tumbling metric-aggregation window, seconds (putmedia_check.sh:15 TIME_RANGE=60;
# CloudWatch --period, putmedia_check.sh:32-33).
METRIC_WINDOW_SECONDS = 60

# Consecutive-failure threshold that trips remediation (restart.sh:15 max_failed_cnt=3).
MAX_FAILED_CNT = 3

# Probes per measurement batch before state reset (restart.sh:18 exec_max_cnt=3).
EXEC_MAX_CNT = 3

# Cooldown between probe batches, seconds (restart.sh:12 loop_time=300).
LOOP_COOLDOWN_SECONDS = 300

# Health-probe loop tick, seconds (restart.sh:157 `sleep 10`).
PROBE_TICK_SECONDS = 10

# Bounded network retries (check_network.sh:10 max_retries=10).
MAX_NETWORK_RETRIES = 10

# Escalation ladder of the watchdog state machine (restart.sh:104-156 and
# check_network.sh:44-92): each remediation step re-probes before escalating.
ESCALATION_LADDER = (
    "alert_email",          # restart.sh:103 (recipient list restart.sh:5-7)
    "restart_network_mgr",  # restart.sh:116
    "restart_gateway",      # restart.sh:26-46 gateway_restart()
    "reconnect_wifi",       # restart.sh:127-129
    "usb_power_cycle",      # restart.sh:136-140; check_network.sh:34-41
    "reboot",               # restart.sh:149; check_network.sh:96
)

# Session-window gap used by the probe-batch cooldown semantics (restart.sh:76-82).
SESSION_GAP_SECONDS = LOOP_COOLDOWN_SECONDS

# The event_type that plays the failed-probe role in the events table
# (FIXTURES.md: `error` ~ restart.sh:90-95 semantics).
FAILURE_EVENT_TYPE = "error"
