"""observer extension semantics, ported from
extension/observer/k8sobserver/handler_test.go and
extension/observer/ecsobserver/{matcher,docker_label,service}_test.go."""

import pytest

from opentelemetry_collector_contrib_ray.stages.observer import (
    DockerLabelMatcher,
    MatchedContainer,
    MatchedTarget,
    ServiceMatcher,
    TaskDefinitionMatcher,
    diff_endpoints,
    match_containers,
    pod_to_endpoints,
)

POD = dict(
    uid="uid-1",
    name="pod-1",
    namespace="default",
    ip="10.0.0.5",
    labels={"app": "web"},
    annotations={},
    containers=[
        dict(name="app", running=True,
             ports=[dict(name="http", port=80, protocol="TCP"),
                    dict(name="dns", port=53, protocol="UDP"),
                    dict(name="raw", port=99, protocol="SCTP")]),
        dict(name="init", running=False,
             ports=[dict(name="x", port=1, protocol="TCP")]),
    ],
)


class TestK8sObserver:
    def test_pod_to_endpoints(self):
        eps = pod_to_endpoints(POD, id_namespace="ns1")
        assert eps[0]["id"] == "ns1/uid-1"
        assert eps[0]["target"] == "10.0.0.5"
        # stopped container's ports excluded (handler.go:66-77)
        assert len(eps) == 4
        by_id = {e["id"]: e for e in eps}
        http = by_id["ns1/uid-1/http(80)"]
        assert http["target"] == "10.0.0.5:80"
        assert http["transport"] == "tcp"
        assert by_id["ns1/uid-1/dns(53)"]["transport"] == "udp"
        assert by_id["ns1/uid-1/raw(99)"]["transport"] == "unknown"

    def test_diff(self):
        old = pod_to_endpoints(POD)
        new_pod = dict(POD, ip="10.0.0.6")
        # stop the app container in the new pod → its ports removed
        new_pod["containers"] = [
            dict(POD["containers"][0], ports=[dict(name="http", port=80,
                                                   protocol="TCP")]),
            POD["containers"][1],
        ]
        new = pod_to_endpoints(new_pod)
        added, updated, removed = diff_endpoints(old, new)
        assert added == []
        # same ids, changed ip → updated
        assert {e["id"] for e in updated} == {
            "k8s_observer/uid-1", "k8s_observer/uid-1/http(80)",
        }
        assert {e["id"] for e in removed} == {
            "k8s_observer/uid-1/dns(53)", "k8s_observer/uid-1/raw(99)",
        }


TASKS = [
    dict(
        service="nginx-service",
        task_definition_arn="arn:aws:ecs:us-east-1:1:task-definition/nginx:1",
        containers=[
            dict(name="nginx", port_mappings=[80, 9113],
                 docker_labels={"PROM_PORT": "9113", "MY_JOB": "lbl-job",
                                "MY_PATH": "/custom"}),
            dict(name="sidecar", port_mappings=[8080],
                 docker_labels={"PROM_PORT": "bad-int"}),
        ],
    ),
    dict(
        service=None,
        task_definition_arn="arn:aws:ecs:us-east-1:1:task-definition/worker:3",
        containers=[dict(name="worker", port_mappings=[9090],
                         docker_labels={})],
    ),
]


class TestDockerLabelMatcher:
    def test_port_label_match(self):
        m = DockerLabelMatcher(dict(port_label="PROM_PORT",
                                    metrics_path_label="MY_PATH",
                                    job_name_label="MY_JOB"))
        res, errs = match_containers(TASKS, m, matcher_index=2)
        assert res["tasks"] == [0]
        assert len(res["containers"]) == 1
        tgt = res["containers"][0].targets[0]
        assert tgt.port == 9113
        assert tgt.metrics_path == "/custom"
        assert tgt.job == "lbl-job"
        assert tgt.matcher_type == "docker_label"
        assert tgt.matcher_index == 2
        # the bad-int label is an ERROR, not a silent skip
        assert len(errs) == 1 and "bad-int" in errs[0]

    def test_config_job_overrides_label(self):
        m = DockerLabelMatcher(dict(port_label="PROM_PORT",
                                    job_name_label="MY_JOB",
                                    job_name="cfg-job"))
        res, _ = match_containers(TASKS, m)
        assert res["containers"][0].targets[0].job == "cfg-job"

    def test_port_must_be_mapped(self):
        tasks = [dict(service=None, task_definition_arn="x", containers=[
            dict(name="c", port_mappings=[80],
                 docker_labels={"PROM_PORT": "9999"})])]
        res, errs = match_containers(
            tasks, DockerLabelMatcher(dict(port_label="PROM_PORT")))
        assert res["containers"] == [] and errs == []

    def test_config_validation(self):
        with pytest.raises(ValueError, match="port_label is empty"):
            DockerLabelMatcher(dict())
        with pytest.raises(ValueError, match="metrics_ports is not supported"):
            DockerLabelMatcher(dict(port_label="P", metrics_ports=[404]))


class TestServiceMatcher:
    def test_service_and_ports(self):
        m = ServiceMatcher(dict(name_pattern="^nginx-", metrics_ports=[9113],
                                metrics_path="/metrics", job_name="svc-job"))
        res, errs = match_containers(TASKS, m)
        assert errs == []
        assert res["tasks"] == [0]
        # both containers match the (absent) name pattern; only nginx
        # has a metrics port
        tgts = [t for c in res["containers"] for t in c.targets]
        assert len(tgts) == 1
        assert tgts[0].port == 9113
        assert tgts[0].metrics_path == "/metrics"
        assert tgts[0].job == "svc-job"
        assert tgts[0].matcher_type == "service"

    def test_no_service_never_matches(self):
        m = ServiceMatcher(dict(name_pattern=".*", metrics_ports=[9090]))
        res, _ = match_containers([TASKS[1]], m)
        assert res["tasks"] == []

    def test_container_name_pattern(self):
        m = ServiceMatcher(dict(name_pattern="^nginx-",
                                container_name_pattern="^sidecar$",
                                metrics_ports=[8080]))
        res, _ = match_containers(TASKS, m)
        tgts = [t for c in res["containers"] for t in c.targets]
        assert [t.port for t in tgts] == [8080]


class TestTaskDefinitionMatcher:
    def test_arn_pattern(self):
        m = TaskDefinitionMatcher(dict(arn_pattern="task-definition/worker",
                                       metrics_ports=[9090]))
        res, _ = match_containers(TASKS, m)
        assert res["tasks"] == [1]
        tgts = [t for c in res["containers"] for t in c.targets]
        assert [t.port for t in tgts] == [9090]
        assert tgts[0].matcher_type == "task_definition"


class TestMergeTargets:
    def test_existing_wins(self):
        # matcher.go:88-100
        mc = MatchedContainer(task_index=0, container_index=0,
                              targets=[MatchedTarget(port=80,
                                                     metrics_path="/m",
                                                     job="old")])
        mc.merge_targets([
            MatchedTarget(port=80, metrics_path="/m", job="new"),  # dup
            MatchedTarget(port=80, metrics_path="/other", job="n2"),
        ])
        assert len(mc.targets) == 2
        assert mc.targets[0].job == "old"
        assert mc.targets[1].metrics_path == "/other"
