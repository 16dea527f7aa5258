#!/bin/sh
### BEGIN INIT INFO
# Provides:          rtl-airband-tpu
# Required-Start:    $network $remote_fs
# Required-Stop:     $network $remote_fs
# Default-Start:     2 3 4 5
# Default-Stop:      0 1 6
# Short-Description: TPU-native SDR AM/NFM demodulator
# Description:       rtlsdr-airband-tpu daemon (sysvinit systems; prefer
#                    deploy/rtl-airband-tpu.service under systemd).
### END INIT INFO
#
# Deployment parity with the reference's init.d/ scripts: daemonization is
# done by the program itself (double fork + pidfile, cli.py), so this
# script only starts/stops/queries it.

NAME=rtl-airband-tpu
DAEMON=/usr/local/bin/rtl-airband-tpu
CONFIG=/usr/local/etc/rtl_airband.conf
PIDFILE=/run/rtl_airband_tpu.pid

[ -x "$DAEMON" ] || exit 0

case "$1" in
  start)
    echo "Starting $NAME"
    # no -F/-f: the program daemonizes and writes $PIDFILE (set `pidfile`
    # in the config to match PIDFILE above)
    "$DAEMON" -c "$CONFIG"
    ;;
  stop)
    echo "Stopping $NAME"
    if [ -r "$PIDFILE" ]; then
      kill "$(cat "$PIDFILE")" && rm -f "$PIDFILE"
    else
      echo "$PIDFILE not found; is it running?" >&2
      exit 1
    fi
    ;;
  restart)
    "$0" stop
    sleep 2
    "$0" start
    ;;
  status)
    if [ -r "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
      echo "$NAME is running (pid $(cat "$PIDFILE"))"
    else
      echo "$NAME is not running"
      exit 3
    fi
    ;;
  *)
    echo "Usage: $0 {start|stop|restart|status}" >&2
    exit 1
    ;;
esac
exit 0
