PREFIX ex: <http://ex/>
DELETE WHERE { GRAPH ex:g1 { ?s ?p ?o } }
