#!/bin/sh
# Live-Postgres opt-in CI path (r6 verdict item 7): boot a disposable
# PostgreSQL in docker, fetch the public JDBC driver jar if absent, run
# the pg-dialect tests against it, tear down.  Derby remains the
# in-repo default — this script is for environments WITH docker +
# network (this sandbox has neither; everything here is standard public
# tooling: the docker-library postgres image and the Maven Central
# org.postgresql:postgresql artifact).
#
#     sh tools/pg_docker_ci.sh            # full cycle
#     KEEP=1 sh tools/pg_docker_ci.sh     # leave the container running
set -eu

REPO=$(cd "$(dirname "$0")/.." && pwd)
NAME=sg-pg-ci
PORT=${PORT:-54330}
PG_VERSION=${PG_VERSION:-16}
JDBC_VERSION=${JDBC_VERSION:-42.7.4}
JAR=${SPARK_GRAFT_PG_JAR:-/tmp/postgresql-${JDBC_VERSION}.jar}

if [ ! -f "$JAR" ]; then
    echo "fetching postgresql JDBC ${JDBC_VERSION} from Maven Central"
    curl -fsSL -o "$JAR" \
        "https://repo1.maven.org/maven2/org/postgresql/postgresql/${JDBC_VERSION}/postgresql-${JDBC_VERSION}.jar"
fi

docker rm -f "$NAME" >/dev/null 2>&1 || true
docker run -d --name "$NAME" \
    -e POSTGRES_PASSWORD=sgtest -e POSTGRES_DB=sgtest \
    -p "127.0.0.1:${PORT}:5432" "postgres:${PG_VERSION}"

# wait for the server to accept connections
i=0
until docker exec "$NAME" pg_isready -U postgres >/dev/null 2>&1; do
    i=$((i + 1))
    [ "$i" -gt 60 ] && { echo "postgres never became ready"; exit 1; }
    sleep 1
done

status=0
SPARK_GRAFT_PG_URL="jdbc:postgresql://127.0.0.1:${PORT}/sgtest" \
SPARK_GRAFT_PG_USER=postgres \
SPARK_GRAFT_PG_PASSWORD=sgtest \
SPARK_GRAFT_PG_JAR="$JAR" \
PYTHONPATH="$REPO" \
python -m pytest "$REPO/tests/test_jdbc_postgres.py" -q || status=$?

if [ "${KEEP:-0}" != "1" ]; then
    docker rm -f "$NAME" >/dev/null
fi
exit "$status"
